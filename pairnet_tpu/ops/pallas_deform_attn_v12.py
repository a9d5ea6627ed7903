"""Pallas TPU multi-scale deformable attention, v12 ("fused levels").

v11 (pallas_deform_attn_v11.py) launches one pallas_call per value level:
per layer that pays the per-grid-cell fixed cost (tap prep, sel build,
pipeline fill) three times, writes three full (BH, Qp, D) f32 partial
outputs that XLA then scale-folds and sums (a ~1.7 ms/layer fusion at
bench geometry), and re-reads them for the level sum.

v12 fuses the three levels into ONE kernel:

* the packed int8 planes concatenate along S (static per-level offsets);
* coords/bases/counts carry a level axis; the kernel unrolls the level
  loop, reusing the per-group (D, 128) accumulators;
* the int8 row scale folds in-kernel AFTER the sel matmul — ``res_l``
  is (qpg, D) with D in lanes, so ``res_l * scale_l[None, :]`` is a free
  lane-broadcast (the same fold as XLA's per-level fusion, for nothing);
* one bf16 output (half the write traffic of one f32 level output, a
  sixth of three).

Block-scan semantics (per-group windows, shared max-length loop, clamped
slice base) are exactly v11's; see that module for the in-bounds proof.
Numerics: identical quantization and weights; the only delta vs v11 is the
level sum happening in f32 inside the kernel vs f32 in XLA (same order:
level 0 + level 1 + level 2) and the final bf16 round of the output (the
consumer casts to bf16 anyway in bf16 inference — where this kernel is the
default — so end-model numerics are unchanged).

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

TQ = int(_os.environ.get("PAIRNET_DEFORM12_TQ", "256"))
UNROLL = int(_os.environ.get("PAIRNET_DEFORM12_UNROLL", "2"))
BLK = 128


def _qp_kernel(v_ref, scale_ref, out_ref, *, shapes, lvl_offs, s_pads):
    """Fused int8 quantize + quad-pack of the concatenated value plane.

    The XLA formulation (v10's ``_quantize_rows`` + ``_pack_quads``) builds
    four full int32 plane copies through badly-tiled strided slice chains —
    measured ~5.6 ms/layer at bench geometry, the single largest piece of
    the encoder's non-kernel time.  Here the whole (D, S_pad) plane sits in
    VMEM: one bf16 read, one int32 write, all shifts are in-register lane
    moves.  Numerics are BIT-IDENTICAL to the XLA path: same f32 divide by
    the same absmax/127 scale, same jnp.round/clip.  Cross-level pollution
    is structurally impossible regardless of pad width — each level's slice
    is quantized and packed independently and ``sh()`` zero-fills within the
    slice; the zero pad (>= the max shift distance w+1) additionally
    reproduces the XLA path's zero fill at each level's tail.
    """
    for lvl, (_h, w) in enumerate(shapes):
        off, sp = lvl_offs[lvl], s_pads[lvl]
        vl = v_ref[0, :, off : off + sp].astype(jnp.float32)
        scale = scale_ref[0, :, lvl : lvl + 1]  # (D, 1)
        q = jnp.clip(jnp.round(vl / scale), -127, 127).astype(jnp.int32)
        b = q & 0xFF
        D = b.shape[0]
        z = jnp.zeros((D, w + 1), jnp.int32)

        def sh(n, b=b, z=z, sp=sp):
            return jnp.concatenate([b[:, n:], z[:, :n]], axis=1)

        out_ref[0, :, off : off + sp] = (
            b | (sh(1) << 8) | (sh(w) << 16) | (sh(w + 1) << 24)
        )


def _quantize_pack_fused(vraw, scales_dl, shapes, lvl_offs, s_pads):
    """(BH, D, S_pad_total) raw plane + (BH, D, L) scales -> packed i32.

    VMEM headroom: each grid cell stages the full (1, D, S_pad) plane
    (bf16 in + i32 out + f32 temporaries) — a few MB at bench geometry,
    but at very large multi-scale geometries (S_pad in the 100k+ range)
    the working set can exceed per-core VMEM and the kernel fails to
    COMPILE (no silent spill). If such geometries come into scope, add a
    per-level (or per-S-block within a level) grid axis: levels are
    already packed independently, so the split is semantics-free.
    """
    BH, D, S_pad = vraw.shape
    kern = functools.partial(
        _qp_kernel, shapes=shapes, lvl_offs=lvl_offs, s_pads=s_pads
    )
    return pl.pallas_call(
        kern,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, D, S_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, len(shapes)), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, D, S_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, D, S_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(vraw, scales_dl)


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
        # taps index into the concatenated plane at this level's offset
        idx_all = idx_all + lvl_offs[lvl]
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
        # TWO block visits per dynamic-loop iteration: Mosaic's per-
        # iteration loop overhead (scalar bound check + carried-tuple
        # bookkeeping) measures comparable to the visit work itself at
        # tight-offset geometry, so halving the trip count is nearly free
        # throughput.  The odd extra visit (count rounded up to a pair)
        # lands past every group's window, where all taps mask to zero —
        # same in-bounds argument as v11's shared max-length loop.
        count = counts_ref[tile * L + lvl]

        def visit(acc, j, k, taps, lvl):
            b0 = jnp.minimum(
                bases_ref[(tile * L + lvl) * ng + j] + k * BLK, max_b0
            )
            b0 = pl.multiple_of(b0, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]
            idx_j, k00, k01, k10, k11 = taps[j]
            rel = idx_j - b0
            inb = (rel >= 0) & (rel < BLK)
            lo = jnp.clip(rel, 0, BLK - 1)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )
            b00 = ((g << 24) >> 24).astype(jnp.float32)
            b01 = ((g << 16) >> 24).astype(jnp.float32)
            b10 = ((g << 8) >> 24).astype(jnp.float32)
            b11 = (g >> 24).astype(jnp.float32)
            return (
                acc
                + b00 * jnp.where(inb, k00, 0.0)
                + b01 * jnp.where(inb, k01, 0.0)
                + b10 * jnp.where(inb, k10, 0.0)
                + b11 * jnp.where(inb, k11, 0.0)
            )

        def blk_body(k2, accs, taps=taps, lvl=lvl):
            out = []
            for j in range(ng):
                acc = accs[j]
                for u in range(UNROLL):
                    acc = visit(acc, j, UNROLL * k2 + u, taps, lvl)
                out.append(acc)
            return tuple(out)

        accs = tuple(jnp.zeros((D, BLK), jnp.float32) for _ in range(ng))
        accs = jax.lax.fori_loop(
            0, (count + UNROLL - 1) // UNROLL, blk_body, accs
        )

        scale_row = scale_ref[0, lvl, :].reshape(1, D)  # D in lanes
        for j in range(ng):
            res = jax.lax.dot_general(
                sel, accs[j], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs[j] = outs[j] + res * scale_row

    for j in range(ng):
        out_ref[0, j * qpg : (j + 1) * qpg, :] = outs[j].astype(out_ref.dtype)


def _weighted_gather_v12(values_p, scales, xg, yg, ag, bases, counts, shapes, lvl_offs):
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


def _ms_deform_attn_v12_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    L = len(spatial_shapes)
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

    # one well-tiled relayout to plane-major (BH, D, S) instead of three
    # per-level (B, S_l, H, D) -> (BH, D, S_l) transposes: the source's
    # (H, D) minor dims tile terribly (D = 32 < 128 lanes), so XLA lowered
    # the per-level path as strided ~3.5 ms/layer slice chains at bench
    # geometry. (B, S, C) -> (C, B, S) keeps a 128-divisible minor dim on
    # both sides; the (H, D, B, S) -> (B, H, D, S) step only permutes major
    # dims (minor S untouched), which moves whole tiles at HBM bandwidth.
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
        # scale via a cheap XLA reduce (fuses with the relayout producer);
        # quantize+pack runs fused in _qp_kernel on the concatenated plane
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
    # interleave per tile: (BH, nqt, L, ng) so the kernel indexes
    # bases[(tile*L + lvl)*ng + g]
    bases = jnp.concatenate(bases_l, axis=2)  # (BH, nqt, L, ng)
    counts = jnp.concatenate(counts_l, axis=2)  # (BH, nqt, L)

    sampled = _weighted_gather_v12(
        vp, scales, xg, yg, ag, bases, counts,
        tuple(spatial_shapes), tuple(lvl_offs),
    )
    out = sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v12(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v12_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v12_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v12.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v12",
        lambda v, s, l, w: ms_deform_attn_pallas_v12(v, s, l, w),
    )


register()
