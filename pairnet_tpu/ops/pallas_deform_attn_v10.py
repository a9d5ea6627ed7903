"""Pallas TPU multi-scale deformable attention, v10 ("quad-packed int8").

v7 (pallas_deform_attn_v7.py) halved v6's gather count by packing the two
x-corners of a bilinear tap into one int32 lane as bf16 halves; gathers
still measure ~53% of kernel time and need TWO per tap (one per y-corner).
v10 halves them again: the value plane is quantized to int8 (per
(batch*head, channel)-row absmax scale) and re-packed so int32 lane ``s``
holds the FULL 2x2 bilinear footprint ``(v[s], v[s+1], v[s+w], v[s+w+1])``
as four signed bytes — ONE 32-bit gather per tap fetches all four corners.

Knock-on wins over v7 at the same TQ:
* queries per gather group doubles (qpg = 128 // P = 32), so a tile has
  HALF the gather groups -> half the block-loop mask math and half the
  0/1 sel-matmuls reducing taps to queries;
* the union block range covers only the quad BASE indices (the y+1 row
  rides along inside the packed bytes), so per-tile block counts shrink
  by roughly one plane row vs v7.

Numerics: values are quantized per (BH, D) row to int8 (absmax / 127);
bilinear weights, in-kernel accumulation and the sel reduction stay f32,
and the row scale is folded back OUTSIDE the kernel (one XLA broadcast
multiply), so the only error source is the int8 value rounding
(<= absmax/254 per value; see tests/test_pallas_deform_v10.py for the
exact-parity-vs-dequantized check and tools/ab_kernel_fullgeom.py for the
end-metric bound at production geometry). Opt-in via
``PAIRNET_DEFORM_IMPL=pallas_v10``; the backward reuses v6's kernel on
the saved full-precision inputs.

Ref: mmcv MultiScaleDeformableAttention semantics (SURVEY.md §2.4);
sampling location p maps to pixel p * size - 0.5, out-of-plane corners
contribute zero.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_deform_attn_v6 import (
    _ms_deform_attn_v6_bwd_impl,
    _round_up,
)

TQ = int(_os.environ.get("PAIRNET_DEFORM10_TQ", "256"))
BLK = 128


def _group_taps_quad(x, y, aw, h, w):
    """x/y/aw (ng, qpg*P) f32 -> quad-base idx (ng, 128) i32 + 4 slot weights.

    Tap lane = q_local * P + p.  ``idx`` is the flat index of the quad base
    (y0, x0) with both coords clamped into the plane; the packed word at
    ``idx`` holds bytes (b00, b01, b10, b11) = values at (y0,x0), (y0,x0+1),
    (y0+1,x0), (y0+1,x0+1).  When x0 == -1 the base clamps to x=0, whose
    b00/b10 bytes ARE the x1 corners, so the x1 weights route onto the
    lo-x slots (and the hi-x slots zero); same routing for y0 == -1.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    sx = x0i < 0
    sy = y0i < 0
    xok0 = (x0i >= 0) & (x0i < w)
    xok1 = (x0i + 1 >= 0) & (x0i + 1 < w)
    yok0 = (y0i >= 0) & (y0i < h)
    yok1 = (y0i + 1 >= 0) & (y0i + 1 < h)
    idx = jnp.clip(y0i, 0, h - 1) * w + jnp.clip(x0i, 0, w - 1)
    w00 = ((1 - fx) * (1 - fy) * aw * (xok0 & yok0)).astype(jnp.float32)
    w01 = (fx * (1 - fy) * aw * (xok1 & yok0)).astype(jnp.float32)
    w10 = ((1 - fx) * fy * aw * (xok0 & yok1)).astype(jnp.float32)
    w11 = (fx * fy * aw * (xok1 & yok1)).astype(jnp.float32)
    # x == -1 edge: base clamps right, x1 weights move onto the lo-x slots
    a00 = jnp.where(sx, w01, w00)
    a01 = jnp.where(sx, 0.0, w01)
    a10 = jnp.where(sx, w11, w10)
    a11 = jnp.where(sx, 0.0, w11)
    # y == -1 edge: base clamps down, y1 weights move onto the lo-y slots
    k00 = jnp.where(sy, a10, a00)
    k10 = jnp.where(sy, 0.0, a10)
    k01 = jnp.where(sy, a11, a01)
    k11 = jnp.where(sy, 0.0, a11)
    return idx, k00, k01, k10, k11


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

    idx_all, k00a, k01a, k10a, k11a = _group_taps_quad(
        x_ref[0], y_ref[0], a_ref[0], h, w
    )
    taps = [
        (
            idx_all[j : j + 1],
            k00a[j : j + 1],
            k01a[j : j + 1],
            k10a[j : j + 1],
            k11a[j : j + 1],
        )
        for j in range(ng)
    ]
    m = meta_ref[b * nqt + q]
    base = (m >> 12) * BLK
    nblk = m & 0xFFF

    def blk_body(k, accs):
        b0 = pl.multiple_of(base + k * BLK, BLK)
        vbt = v_ref[0, :, pl.ds(b0, BLK)]  # (D, 128) i32: 4 packed int8s
        out = []
        for j in range(ng):
            idx_j, k00, k01, k10, k11 = taps[j]
            rel = idx_j - b0
            inb = (rel >= 0) & (rel < BLK)
            lo = jnp.clip(rel, 0, BLK - 1)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )
            # signed-byte extraction: arithmetic right shift sign-extends
            b00 = ((g << 24) >> 24).astype(jnp.float32)
            b01 = ((g << 16) >> 24).astype(jnp.float32)
            b10 = ((g << 8) >> 24).astype(jnp.float32)
            b11 = (g >> 24).astype(jnp.float32)
            out.append(
                accs[j]
                + b00 * jnp.where(inb, k00, 0.0)
                + b01 * jnp.where(inb, k01, 0.0)
                + b10 * jnp.where(inb, k10, 0.0)
                + b11 * jnp.where(inb, k11, 0.0)
            )
        return tuple(out)

    accs = tuple(jnp.zeros((D, BLK), jnp.float32) for _ in range(ng))
    accs = jax.lax.fori_loop(0, nblk, blk_body, accs)

    for j in range(ng):
        res = jax.lax.dot_general(
            sel, accs[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, j * qpg : (j + 1) * qpg, :] = res


def _quantize_rows(vl):
    """(BH, D, S) float -> int8-in-int32 plane + per-row scale (BH, D, 1)."""
    vl = vl.astype(jnp.float32)
    scale = jnp.max(jnp.abs(vl), axis=2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-20)
    q = jnp.clip(jnp.round(vl / scale), -127, 127).astype(jnp.int32)
    return q, scale


def _pack_quads(q, w):
    """int8-valued (BH, D, S) i32 plane -> quad-packed i32 plane.

    Lane s holds bytes (v[s], v[s+1], v[s+w], v[s+w+1]).  Shifts run over
    the FLAT plane: an x+1 that crosses a row end fetches the next row's
    first pixel, which the kernel's xok1 weight mask already zeroes.
    """
    BH, D, S = q.shape
    z = jnp.zeros((BH, D, 1), jnp.int32)

    def shift(t, n):
        return jnp.concatenate(
            [t[:, :, n:], jnp.broadcast_to(z, (BH, D, n))], axis=2
        )

    b = q & 0xFF
    return (
        b
        | (shift(b, 1) << 8)
        | (shift(b, w) << 16)
        | (shift(b, w + 1) << 24)
    )


def _weighted_gather_v10(values_p, xg, yg, ag, base, nblk, h, w):
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


def _ms_deform_attn_v10_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // P  # one packed quad per tap: 32 queries per gather group
    Qp = _round_up(Q, TQ)

    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(value, offs[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)  # (BH, D, S)
        q8, scale = _quantize_rows(vl)
        vp = jnp.pad(_pack_quads(q8, w), ((0, 0), (0, 0), (0, S_pad - S_l)))

        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = weights[..., lvl, :].astype(jnp.float32)

        def to_groups(t):
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        # union block range over the QUAD-BASE indices the kernel gathers
        # (the y+1 row rides inside the packed bytes — no extra span)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        nqt = Qp // TQ
        lo = jnp.min(flat.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat.reshape(B * H, nqt, TQ * P), axis=-1)
        base = lo // BLK * BLK
        nblk = (hi - base) // BLK + 1  # (BH, nqt)

        sampled = _weighted_gather_v10(vp, xb, yb, ab, base, nblk, h, w)
        # fold the int8 row scale back in XLA (per (BH, D) broadcast)
        sampled = sampled * scale.transpose(0, 2, 1)  # (BH, Qp*, D)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v10(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v10_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v10_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v10.defvjp(_fwd, _bwd)

