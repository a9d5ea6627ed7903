"""Pallas TPU multi-scale deformable attention, v11 ("per-group windows").

v10 ("quad-packed int8", pallas_deform_attn_v10.py) scans each query tile's
UNION block range and runs every gather group against every block. Measured
occupancy at bench geometry (B4, 800x1344, grid-init offsets): mean 11.5
blocks per level-0 tile while a single group's taps span only ~3-5 — the
union pays for (a) the cross-head point spread being re-scanned by all 8
groups and (b) coarse-origin query tiles whose footprint on fine levels is
the whole tile union (a 256-query tile of stride-32 queries covers ~41
stride-8 rows, ~33 blocks).

v11 keeps v10's packing, lane layout, and tile structure but gives each
gather group its OWN block window: scalar-prefetched per-(tile, group)
bases, one shared fori_loop to the per-tile max window length, and the
per-visit value slice taken at ``base_g + k*BLK``. A group of 32
consecutive queries x 4 points spans just its own footprint (~0.3-2.5 rows)
plus the point spread, independent of the other 7 groups and of the tile
union — 2.2x fewer group-block visits at bench geometry (counted: 12.1k ->
5.6k per (batch, head) per layer). Groups inside a tile share the same
head (the grid is b*heads) so their window lengths are similar and the
shared max-loop wastes little.

Safety of the shared max-loop: for k >= nblk_g the group's taps satisfy
idx <= hi_g < base_g + k*BLK, so rel < 0 and the in-block mask zeroes the
visit; the slice offset is clamped to S_pad - BLK so reads stay in bounds
(clamping only happens for such already-masked k — see the inline proof).

Numerics are identical to v10 (same int8 quantization, same weights; only
the scan order changes). The backward reuses v6's kernel on the saved
full-precision inputs.

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
from pairnet_tpu.ops.pallas_deform_attn_v10 import (
    _group_taps_quad,
    _pack_quads,
    _quantize_rows,
)

TQ = int(_os.environ.get("PAIRNET_DEFORM11_TQ", "256"))
BLK = 128


def _kernel(bases_ref, counts_ref, x_ref, y_ref, a_ref, v_ref, out_ref, *, h, w, nqt, s_pad):
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
    tile = b * nqt + q
    count = counts_ref[tile]
    max_b0 = s_pad - BLK

    def blk_body(k, accs):
        out = []
        for j in range(ng):
            b0 = jnp.minimum(bases_ref[tile * ng + j] + k * BLK, max_b0)
            b0 = pl.multiple_of(b0, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]  # (D, 128) i32: 4 packed int8s
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
    accs = jax.lax.fori_loop(0, count, blk_body, accs)

    for j in range(ng):
        res = jax.lax.dot_general(
            sel, accs[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, j * qpg : (j + 1) * qpg, :] = res


def _weighted_gather_v11(values_p, xg, yg, ag, bases, counts, h, w):
    BH, D, S_pad = values_p.shape
    n_groups, gp = xg.shape[1], xg.shape[2]
    nqt = counts.shape[1]
    ng = n_groups // nqt
    kern = functools.partial(_kernel, h=h, w=w, nqt=nqt, s_pad=S_pad)
    coord_spec = pl.BlockSpec(
        (1, ng, gp), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM
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
    )(bases.reshape(-1), counts.reshape(-1), xg, yg, ag, values_p)


def _ms_deform_attn_v11_impl(value, spatial_shapes, locs, weights):
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
        # per-GROUP block windows over the quad-base indices (the y+1 row
        # rides inside the packed bytes — no extra span)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        nqt = Qp // TQ
        ng = TQ // qpg
        lo_g = jnp.min(flat, axis=-1)  # (BH, nqt*ng)
        hi_g = jnp.max(flat, axis=-1)
        bases = (lo_g // BLK * BLK).reshape(B * H, nqt, ng)
        nblk_g = (hi_g.reshape(B * H, nqt, ng) - bases) // BLK + 1
        counts = jnp.max(nblk_g, axis=-1)  # (BH, nqt) shared loop length

        sampled = _weighted_gather_v11(vp, xb, yb, ab, bases, counts, h, w)
        # fold the int8 row scale back in XLA (per (BH, D) broadcast)
        sampled = sampled * scale.transpose(0, 2, 1)  # (BH, Qp*, D)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v11(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v11_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v11_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v11.defvjp(_fwd, _bwd)

