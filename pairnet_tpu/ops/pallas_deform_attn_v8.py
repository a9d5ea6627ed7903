"""Pallas TPU multi-scale deformable attention, v8 ("skip-empty groups").

v7 ("packed-pair gather", see pallas_deform_attn_v7.py) scans the TILE-level
union block range and, per block, runs the gather + weighting for ALL ng
gather groups. But a group's 128 tap lanes cover only ~1-3 of the tile's
~4-12 blocks (16 consecutive queries span ~0.2 plane rows; the tile union
spans the full y-extent of 128 queries x 4 points). v8 wraps each group's
per-block work in a ``lax.cond`` on "any tap of this group lands in this
block": the (shared) value-block slice still loads once per block, but the
4-vreg gather + bf16 unpack + 2 FMAs are skipped for empty group-blocks —
the dominant VPU cost (gathers measured at 57% of v6 kernel time) scales
with per-group occupancy instead of ng * nblk.

Numerics are identical to v7 (the skipped work contributes exactly zero).
Packing/layout/backward are v7's; see that module for the contract.

MEASURED RESULT (v5e, tools/bench_deform_ab.py): 6x SLOWER than v7
(226 vs 37 ms tight, 477 vs 67 ms wide) — Mosaic's lax.cond on a
vector-reduced predicate costs far more than the skipped gather+FMA work
per group-block. Retained as a documented negative result; the dispatcher
never selects v8 automatically.

Ref: mmcv MultiScaleDeformableAttention semantics (SURVEY.md §2.4).
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

TQ = int(_os.environ.get("PAIRNET_DEFORM8_TQ", "128"))
BLK = 128


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

            def occupied(acc):
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

            out.append(
                jax.lax.cond(jnp.any(inb), occupied, lambda a: a, accs[j])
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


def _weighted_gather_v8(values_p, xg, yg, ag, base, nblk, h, w):
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


def _ms_deform_attn_v8_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // (2 * P)
    Qp = _round_up(Q, TQ)

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
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        xbase = jnp.minimum(jnp.maximum(x0, 0), w - 1)
        flat_lo = jnp.clip(y0, 0, h - 1) * w + xbase
        flat_hi = jnp.clip(y0 + 1, 0, h - 1) * w + xbase
        nqt = Qp // TQ
        lo = jnp.min(flat_lo.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat_hi.reshape(B * H, nqt, TQ * P), axis=-1)
        base = jnp.maximum(lo, 0) // BLK * BLK
        nblk = (hi - base) // BLK + 1

        sampled = _weighted_gather_v8(vl, xb, yb, ab, base, nblk, h, w)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v8(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v8_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v8_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    return _ms_deform_attn_v6_bwd_impl(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v8.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v8",
        lambda v, s, l, w: ms_deform_attn_pallas_v8(v, s, l, w),
    )


register()
