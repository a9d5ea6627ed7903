"""Pallas TPU multi-scale deformable attention, v14 ("select-merge").

v12 (pallas_deform_attn_v12.py) extracts the four packed int8 corners and
runs the weighted FMA chain INSIDE the block-visit loop, masking lanes that
fall outside the visited block to zero. A tap lives in exactly one block of
its group's window, so with ~4 visits per (group, level) roughly 3/4 of the
byte-extraction + FMA work (the dominant VPU cost: ~48 + ~32 VREG ops per
visit) is spent producing masked zeros. Measured split at bench geometry
(tools/bench_v12_scan.py): raw kernel 14.3 ms of the 16.7 ms op.

v14 restructures the loop to touch each tap's data ONCE:

* per visit, only the raw gather survives: the packed int32 word is
  SELECT-merged into a per-group carry ``graw`` (``where(inb, g, graw)``,
  one select per visit) — legal because the visited blocks of a window are
  disjoint and every tap's block is inside its group's window, so ``inb``
  is true exactly once per tap;
* the byte extraction, bilinear/attention weighting, sel-matmul reduction
  and int8-scale fold all run ONCE per (level, group) after the loop.

Numerics are BIT-IDENTICAL to v12: the same quantized words feed the same
f32 weight math; v12's per-visit masked additions only ever add exact f32
zeros, so reassociating them away changes nothing (parity test:
tests/test_pallas_deform_v14.py asserts exact equality vs v12 on device and
in interpret mode). The backward reuses v6's kernel on saved full-precision
inputs, exactly like v12.

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
from pairnet_tpu.ops.pallas_deform_attn_v10 import _group_taps_quad
from pairnet_tpu.ops.pallas_deform_attn_v12 import (
    _quantize_pack_fused,
)

TQ = int(_os.environ.get("PAIRNET_DEFORM14_TQ", "256"))
UNROLL = int(_os.environ.get("PAIRNET_DEFORM14_UNROLL", "2"))
BLK = 128


def _kernel(
    bases_ref,
    counts_ref,
    x_ref,
    y_ref,
    a_ref,
    v_ref,
    scale_ref,
    out_ref,
    *,
    shapes,
    lvl_offs,
    nqt,
    s_pad_total,
):
    D = v_ref.shape[1]
    L = len(shapes)
    ng = x_ref.shape[2]
    gp = x_ref.shape[3]
    qpg = TQ // ng
    P = gp // qpg
    b, q = pl.program_id(0), pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 0)
    sel = ((lane % gp) // P == qrow).astype(jnp.float32)

    tile = b * nqt + q
    max_b0 = s_pad_total - BLK

    outs = [jnp.zeros((qpg, D), jnp.float32) for _ in range(ng)]
    for lvl in range(L):
        h, w = shapes[lvl]
        idx_all, k00a, k01a, k10a, k11a = _group_taps_quad(
            x_ref[0, lvl], y_ref[0, lvl], a_ref[0, lvl], h, w
        )
        idx_all = idx_all + lvl_offs[lvl]
        count = counts_ref[tile * L + lvl]
        # every visited b0 is BLK-aligned, so the in-block offset (low 7
        # bits) and block id (high bits) are VISIT-INVARIANT: hoist them out
        # of the loop. idx >= 0 always, so idx >> 7 == b0 >> 7 is exactly
        # the old (idx - b0) in [0, BLK) test.
        lo_all = idx_all & (BLK - 1)
        hi_all = idx_all >> 7

        # visit = one compare + gather + select-merge; a window's blocks are
        # disjoint and cover every tap, so each tap's packed word is selected
        # exactly once (the odd UNROLL-rounding visit lands past the window
        # or on a zero-pad block — same in-bounds argument as v11/v12)
        def visit(graw, j, k, lo_all=lo_all, hi_all=hi_all, lvl=lvl):
            b0 = jnp.minimum(
                bases_ref[(tile * L + lvl) * ng + j] + k * BLK, max_b0
            )
            b0 = pl.multiple_of(b0, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]
            # out-of-block taps gather a lane-wrapped garbage word that the
            # select drops
            inb = hi_all[j : j + 1] == (b0 >> 7)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo_all[j : j + 1], (D, BLK)), axis=1
            )
            return jnp.where(inb, g, graw)

        def blk_body(k2, graws):
            out = []
            for j in range(ng):
                gr = graws[j]
                for u in range(UNROLL):
                    gr = visit(gr, j, UNROLL * k2 + u)
                out.append(gr)
            return tuple(out)

        graws = tuple(jnp.zeros((D, BLK), jnp.int32) for _ in range(ng))
        graws = jax.lax.fori_loop(
            0, (count + UNROLL - 1) // UNROLL, blk_body, graws
        )

        # extraction + weighting + reduction ONCE per (level, group)
        scale_row = scale_ref[0, lvl, :].reshape(1, D)  # D in lanes
        for j in range(ng):
            g = graws[j]
            b00 = ((g << 24) >> 24).astype(jnp.float32)
            b01 = ((g << 16) >> 24).astype(jnp.float32)
            b10 = ((g << 8) >> 24).astype(jnp.float32)
            b11 = (g >> 24).astype(jnp.float32)
            acc = (
                b00 * k00a[j : j + 1]
                + b01 * k01a[j : j + 1]
                + b10 * k10a[j : j + 1]
                + b11 * k11a[j : j + 1]
            )
            res = jax.lax.dot_general(
                sel, acc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs[j] = outs[j] + res * scale_row

    for j in range(ng):
        out_ref[0, j * qpg : (j + 1) * qpg, :] = outs[j].astype(out_ref.dtype)


def _weighted_gather_v14(values_p, scales, xg, yg, ag, bases, counts, shapes, lvl_offs):
    BH, D, S_pad = values_p.shape
    L, n_groups, gp = xg.shape[1], xg.shape[2], xg.shape[3]
    nqt = counts.shape[1]
    ng = n_groups // nqt
    kern = functools.partial(
        _kernel, shapes=shapes, lvl_offs=lvl_offs, nqt=nqt, s_pad_total=S_pad
    )
    coord_spec = pl.BlockSpec(
        (1, L, ng, gp), lambda b, q, *_: (b, 0, q, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, nqt),
        in_specs=[
            coord_spec,
            coord_spec,
            coord_spec,
            pl.BlockSpec(
                (1, D, S_pad), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, L, D), lambda b, q, *_: (b, 0, 0),
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
        out_shape=jax.ShapeDtypeStruct((BH, nqt * TQ, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bases.reshape(-1), counts.reshape(-1), xg, yg, ag, values_p, scales)


def _ms_deform_attn_v14_impl(value, spatial_shapes, locs, weights):
    """Prep identical to v12's (one plane-major relayout, fused
    quantize+pack, per-(tile, level, group) windows); see that module."""
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // P
    Qp = _round_up(Q, TQ)
    nqt = Qp // TQ
    ng = TQ // qpg

    def to_groups(t):
        t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
        if Qp != Q:
            t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
        return t.reshape(B * H, Qp // qpg, qpg * P)

    vT = (
        value.reshape(B, S, H * D)
        .transpose(2, 0, 1)
        .reshape(H, D, B, S)
        .transpose(2, 0, 1, 3)
        .reshape(B * H, D, S)
    )

    planes_raw, scales_l, lvl_offs, s_pads = [], [], [], []
    xs, ys, aws, bases_l, counts_l = [], [], [], [], []
    pos = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad_l = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(vT, offs[lvl], S_l, axis=2)
        scale = jnp.maximum(
            jnp.max(jnp.abs(vl.astype(jnp.float32)), axis=2, keepdims=True)
            / 127.0,
            1e-20,
        )
        planes_raw.append(jnp.pad(vl, ((0, 0), (0, 0), (0, S_pad_l - S_l))))
        scales_l.append(scale)
        lvl_offs.append(pos)
        s_pads.append(S_pad_l)
        pos += S_pad_l

        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = weights[..., lvl, :].astype(jnp.float32)
        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        lo_g = jnp.min(flat, axis=-1)
        hi_g = jnp.max(flat, axis=-1)
        bases = (lo_g // BLK * BLK).reshape(B * H, nqt, 1, ng) + lvl_offs[lvl]
        nblk = (hi_g.reshape(B * H, nqt, 1, ng) + lvl_offs[lvl] - bases) // BLK + 1
        xs.append(xb[:, None])
        ys.append(yb[:, None])
        aws.append(ab[:, None])
        bases_l.append(bases)
        counts_l.append(jnp.max(nblk, axis=-1))  # (BH, nqt, 1)

    vraw = jnp.concatenate(planes_raw, axis=2)  # (BH, D, S_pad_total) raw
    scales_dl = jnp.concatenate(scales_l, axis=2)  # (BH, D, L)
    vp = _quantize_pack_fused(
        vraw, scales_dl, tuple(spatial_shapes), tuple(lvl_offs), tuple(s_pads)
    )
    scales = scales_dl.transpose(0, 2, 1)  # (BH, L, D)
    xg = jnp.concatenate(xs, axis=1)  # (BH, L, n_groups, gp)
    yg = jnp.concatenate(ys, axis=1)
    ag = jnp.concatenate(aws, axis=1)
    bases = jnp.concatenate(bases_l, axis=2)  # (BH, nqt, L, ng)
    counts = jnp.concatenate(counts_l, axis=2)  # (BH, nqt, L)

    sampled = _weighted_gather_v14(
        vp, scales, xg, yg, ag, bases, counts,
        tuple(spatial_shapes), tuple(lvl_offs),
    )
    out = sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v14(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v14_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v14_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v14.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v14",
        lambda v, s, l, w: ms_deform_attn_pallas_v14(v, s, l, w),
    )


register()
