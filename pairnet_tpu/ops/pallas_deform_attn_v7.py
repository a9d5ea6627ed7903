"""Pallas TPU multi-scale deformable attention, v7 ("packed-pair gather").

v6 (see pallas_deform_attn_v6.py) spends ~57% of its kernel time in the
VPU dynamic-gather instructions (measured by ablation: removing only the
gathers cuts a 38.6 ms call to 16.7 ms at encoder geometry).  v7 halves
the gather count by exploiting that the two x-corners of every bilinear
tap are ADJACENT lanes of the value plane: the plane is re-packed in XLA
so that int32 lane ``s`` holds the bf16 pair ``(v[s], v[s+1])``; one
32-bit gather then fetches both corners, and the bf16 halves are
recovered with two bit-ops (``pp << 16`` and ``pp & 0xffff0000`` are the
f32 bit patterns of the bf16 values — no convert instruction needed).

Tap-lane layout becomes 2 y-corners x (qpg * P) instead of 4 corners,
so a 128-query tile has 8 gather groups of 16 queries (vs v6's 16 of 8).
Weight routing handles the ``x0 == -1`` edge (pair base clamps to 0, the
x1 weight moves onto the lo half).  Everything else — union block range
via scalar prefetch, fori_loop block scan, 0/1 sel matmul to reduce taps
to queries — matches v6.  Measured ~20% faster than v6 end-to-end on the
encoder geometry (35.5 vs 44.3 ms wide-offset, 16.8 vs 19.7 tight).

Packing values to 16 bits is only lossless when the incoming values are
already bfloat16 — the production inference dtype.  The dispatcher in
ops/deform_attn.py therefore selects v7 for bf16 values and v6 for f32
(the exact-parity path).  The backward pass reuses v6's kernel (it only
depends on the saved inputs, not on how the forward gathered).

Ref: mmcv MultiScaleDeformableAttention semantics (SURVEY.md §2.4);
sampling location p maps to pixel p * size - 0.5, out-of-plane corners
contribute zero.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_deform_attn_v6 import (
    _cdiv,
    _ms_deform_attn_v6_bwd_impl,
    _round_up,
)

import os as _os

TQ = int(_os.environ.get("PAIRNET_DEFORM7_TQ", "256"))  # 256: ~6-12% over 128 (tools/bench_deform_ab)
BLK = 128


def _group_taps_packed(x, y, aw, h, w):
    """x/y/aw (ng, qpg*P) f32 -> pair idx (ng, 128) i32, wlo/whi (ng, 128).

    Tap lane = ycorner * (qpg*P) + q_local * P + p.  ``idx`` is the flat
    index of the PAIR base (x0 clamped into [0, w-1]); wlo/whi weight the
    lo (x0) and hi (x0+1) bf16 halves.  When x0 == -1 the pair base
    clamps to 0, which holds corner x0+1 in its LO half — the x1 weight
    is routed to wlo and whi zeroed.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    shift = x0i < 0
    xb = jnp.minimum(jnp.maximum(x0i, 0), w - 1)
    xok0 = (x0i >= 0) & (x0i < w)
    xok1 = (x0i + 1 >= 0) & (x0i + 1 < w)
    idxs, wlo, whi = [], [], []
    for dy, cwy in ((0, 1 - fy), (1, fy)):
        yi = y0i + dy
        yok = (yi >= 0) & (yi < h)
        idxs.append(jnp.clip(yi, 0, h - 1) * w + xb)
        w0 = (cwy * (1 - fx) * aw * (xok0 & yok)).astype(jnp.float32)
        w1 = (cwy * fx * aw * (xok1 & yok)).astype(jnp.float32)
        wlo.append(jnp.where(shift, w1, w0))
        whi.append(jnp.where(shift, 0.0, w1))
    return (
        jnp.concatenate(idxs, -1),
        jnp.concatenate(wlo, -1),
        jnp.concatenate(whi, -1),
    )


def _kernel(meta_ref, x_ref, y_ref, a_ref, v_ref, out_ref, *, h, w, nqt):
    D = v_ref.shape[1]
    ng = x_ref.shape[1]
    gp = x_ref.shape[2]
    qpg = TQ // ng
    P = gp // qpg
    b, q = pl.program_id(0), pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 0)
    sel = ((lane % gp) // P == qrow).astype(jnp.float32)

    idx_all, wlo_all, whi_all = _group_taps_packed(
        x_ref[0], y_ref[0], a_ref[0], h, w
    )
    taps = [
        (idx_all[j : j + 1], wlo_all[j : j + 1], whi_all[j : j + 1])
        for j in range(ng)
    ]
    m = meta_ref[b * nqt + q]
    base = (m >> 12) * BLK
    nblk = m & 0xFFF

    def blk_body(k, accs):
        b0 = pl.multiple_of(base + k * BLK, BLK)
        vbt = v_ref[0, :, pl.ds(b0, BLK)]  # (D, 128) i32 packed bf16 pairs
        out = []
        for j in range(ng):
            idx_j, wlo_j, whi_j = taps[j]
            rel = idx_j - b0
            inb = (rel >= 0) & (rel < BLK)
            klo = jnp.where(inb, wlo_j, 0.0)
            khi = jnp.where(inb, whi_j, 0.0)
            lo = jnp.clip(rel, 0, BLK - 1)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )
            # bf16 halves as f32 bit patterns: lo half shifted up, hi
            # half masked in place (bf16 -> f32 is a pure bit extension)
            v0 = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
            v1 = jax.lax.bitcast_convert_type(
                g & jnp.int32(-65536), jnp.float32
            )
            out.append(accs[j] + v0 * klo + v1 * khi)
        return tuple(out)

    accs = tuple(jnp.zeros((D, BLK), jnp.float32) for _ in range(ng))
    accs = jax.lax.fori_loop(0, nblk, blk_body, accs)

    for j in range(ng):
        res = jax.lax.dot_general(
            sel, accs[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, j * qpg : (j + 1) * qpg, :] = res


def _pack_pairs(vl):
    """(BH, D, S) bf16 -> (BH, D, S) i32 with lane s = (v[s], v[s+1])."""
    u16 = jax.lax.bitcast_convert_type(vl, jnp.uint16).astype(jnp.int32)
    nxt = jnp.concatenate(
        [u16[:, :, 1:], jnp.zeros((*u16.shape[:2], 1), jnp.int32)], axis=2
    )
    return u16 | (nxt << 16)


def _weighted_gather_v7(values_p, xg, yg, ag, base, nblk, h, w):
    """values_p (BH, D, S_pad) i32 packed; coords in gather-group layout."""
    BH, D, S_pad = values_p.shape
    n_groups, gp = xg.shape[1], xg.shape[2]
    nqt = base.shape[1]
    ng = n_groups // nqt
    meta = ((base // BLK) << 12 | nblk).reshape(-1)
    kern = functools.partial(_kernel, h=h, w=w, nqt=nqt)
    coord_spec = pl.BlockSpec(
        (1, ng, gp), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nqt),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (1, D, S_pad), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TQ, D), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, nqt * TQ, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(meta, xg, yg, ag, values_p)


def _ms_deform_attn_v7_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // (2 * P)  # queries per gather group (2 packed y-corners)
    Qp = _round_up(Q, TQ)

    value = value.astype(jnp.bfloat16)
    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(value, offs[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)  # (BH, D, S)
        vl = jnp.pad(_pack_pairs(vl), ((0, 0), (0, 0), (0, S_pad - S_l)))

        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = weights[..., lvl, :].astype(jnp.float32)

        def to_groups(t):
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        # union block range over the PAIR-BASE indices actually used by
        # the kernel (x clamped to [0, w-1], both y-corners clamped)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        xbase = jnp.minimum(jnp.maximum(x0, 0), w - 1)
        flat_lo = jnp.clip(y0, 0, h - 1) * w + xbase
        flat_hi = jnp.clip(y0 + 1, 0, h - 1) * w + xbase
        nqt = Qp // TQ
        lo = jnp.min(flat_lo.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat_hi.reshape(B * H, nqt, TQ * P), axis=-1)
        base = jnp.maximum(lo, 0) // BLK * BLK
        nblk = (hi - base) // BLK + 1  # (BH, nqt)

        sampled = _weighted_gather_v7(vl, xb, yb, ab, base, nblk, h, w)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v7(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v7_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v7_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v7.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v7",
        lambda v, s, l, w: ms_deform_attn_pallas_v7(v, s, l, w),
    )


register()
