"""Pallas TPU multi-scale deformable attention, v9 ("point-major groups").

v7's gather groups hold 16 queries x 4 points: the 4 points' offsets spread
up to +-4 px in y (mmcv init bias scales with the point index), so EVERY
group's tap span is nearly the whole tile union (~4-12 blocks) and every
block visit re-processes all 128 tap lanes at ~1/nblk occupancy — the v6
docstring's "per-group counts nearly as high as the union".

v9 regroups: one group = ONE sampling point x 64 consecutive queries (x 2
packed y-corners = 128 lanes). Consecutive queries are adjacent pixels, so
a group's span is that single point's tiny neighborhood (~1-3 blocks), and
each group scans its OWN prefetched block range. Point-groups of the same
query half accumulate into a shared (D, 128) accumulator (corner/query
lanes line up across points), so the taps->queries reduction stays two 0/1
matmuls per tile.

Packing (bf16 x-corner pairs in i32 lanes) and the backward pass are v7's;
see pallas_deform_attn_v7.py for the value-plane contract.

Ref: mmcv MultiScaleDeformableAttention semantics (SURVEY.md §2.4);
sampling location p maps to pixel p * size - 0.5, out-of-plane corners
contribute zero.

MEASURED RESULT (v5e, tools/bench_deform_ab.py): 2.5x SLOWER than v7
(95.4 vs 37.4 ms at tight ~2px offsets). The per-group-visit fixed cost
(dynamic value slice + fori_loop setup + meta read) dominates the saved
gather lanes — the same effect the v6 docstring reports for its per-group
trial. Retained as a documented negative result with its parity test; the
dispatcher never selects v9 automatically.
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
from pairnet_tpu.ops.pallas_deform_attn_v7 import (
    _group_taps_packed,
    _pack_pairs,
)

import os as _os

TQ = int(_os.environ.get("PAIRNET_DEFORM9_TQ", "128"))
BLK = 128
QH = 64  # queries per half (2 packed y-corners x 64 = 128 tap lanes)


def _kernel(meta_ref, x_ref, y_ref, a_ref, v_ref, out_ref, *, h, w, nqt, P):
    D = v_ref.shape[1]
    ng = x_ref.shape[2]  # (1, 1, ng, QH) blocks; ng = halves * P
    halves = TQ // QH
    b, t = pl.program_id(0), pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (QH, BLK), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (QH, BLK), 0)
    sel = ((lane % QH) == qrow).astype(jnp.float32)  # (64, 128)

    idx_all, wlo_all, whi_all = _group_taps_packed(
        x_ref[0, 0], y_ref[0, 0], a_ref[0, 0], h, w
    )  # (ng, 128): lane = ycorner * 64 + q

    accs = [jnp.zeros((D, BLK), jnp.float32) for _ in range(halves)]
    for j in range(ng):
        half = j // P
        m = meta_ref[(b * nqt + t) * ng + j]
        base = (m >> 12) * BLK
        nblk = m & 0xFFF
        idx_j = idx_all[j : j + 1]
        wlo_j = wlo_all[j : j + 1]
        whi_j = whi_all[j : j + 1]

        def blk_body(k, acc, idx_j=idx_j, wlo_j=wlo_j, whi_j=whi_j, base=base):
            b0 = pl.multiple_of(base + k * BLK, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]  # (D, 128) packed bf16 pairs
            rel = idx_j - b0
            inb = (rel >= 0) & (rel < BLK)
            klo = jnp.where(inb, wlo_j, 0.0)
            khi = jnp.where(inb, whi_j, 0.0)
            lo = jnp.clip(rel, 0, BLK - 1)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )
            v0 = jax.lax.bitcast_convert_type(g << 16, jnp.float32)
            v1 = jax.lax.bitcast_convert_type(
                g & jnp.int32(-65536), jnp.float32
            )
            return acc + v0 * klo + v1 * khi

        accs[half] = jax.lax.fori_loop(0, nblk, blk_body, accs[half])

    for half in range(halves):
        res = jax.lax.dot_general(
            sel, accs[half], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, half * QH : (half + 1) * QH, :] = res


def _weighted_gather_v9(values_p, xg, yg, ag, base, nblk, h, w, P):
    """values_p (BH, D, S_pad) i32; coords (BH, nqt, ng, QH);
    base/nblk (BH, nqt, ng)."""
    BH, D, S_pad = values_p.shape
    nqt, ng = xg.shape[1], xg.shape[2]
    meta = ((base // BLK) << 12 | nblk).reshape(-1)
    kern = functools.partial(_kernel, h=h, w=w, nqt=nqt, P=P)
    coord_spec = pl.BlockSpec(
        (1, 1, ng, QH), lambda b, t, *_: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, nqt),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (1, D, S_pad), lambda b, t, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TQ, D), lambda b, t, *_: (b, t, 0), memory_space=pltpu.VMEM
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


def _ms_deform_attn_v9_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    Qp = _round_up(Q, TQ)
    nqt = Qp // TQ
    halves = TQ // QH
    ng = halves * P

    value = value.astype(jnp.bfloat16)
    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(value, offs[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)
        vl = jnp.pad(_pack_pairs(vl), ((0, 0), (0, 0), (0, S_pad - S_l)))

        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = weights[..., lvl, :].astype(jnp.float32)

        def to_groups(t):
            """(B, Q, H, P) -> (BH, nqt, halves*P, QH) point-major lanes."""
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            t = t.reshape(B * H, nqt, halves, QH, P)
            return t.transpose(0, 1, 2, 4, 3).reshape(B * H, nqt, ng, QH)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        # PER-GROUP block range over the pair-base indices the kernel uses
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        xbase = jnp.minimum(jnp.maximum(x0, 0), w - 1)
        flat_lo = jnp.clip(y0, 0, h - 1) * w + xbase
        flat_hi = jnp.clip(y0 + 1, 0, h - 1) * w + xbase
        lo = jnp.min(flat_lo, axis=-1)  # (BH, nqt, ng)
        hi = jnp.max(flat_hi, axis=-1)
        base = jnp.maximum(lo, 0) // BLK * BLK
        nblk = (hi - base) // BLK + 1

        sampled = _weighted_gather_v9(vl, xb, yb, ab, base, nblk, h, w, P)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v9(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v9_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v9_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    return _ms_deform_attn_v6_bwd_impl(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v9.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v9",
        lambda v, s, l, w: ms_deform_attn_pallas_v9(v, s, l, w),
    )


register()
