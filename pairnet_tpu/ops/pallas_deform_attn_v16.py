"""Pallas TPU multi-scale deformable attention, v16 ("int4 pair-channel").

The v14 kernel is gather-bound: the 128-lane dynamic gather is 61% of
kernel time and its cost is proportional to the number of (sublane-rows x
128-lane) VREGs moved per block visit — D = 32 int32 rows with v10's
quad-packed int8 (the full 2x2 bilinear footprint of ONE channel per
lane).  v16 halves that traffic by packing the 2x2 footprint of TWO
channels as eight 4-bit nibbles per int32 lane:

* plane rows pair channel ``d`` with channel ``d + D/2`` (contiguous
  sublane halves — no strided shuffles in prep or extraction);
* bits [0:16) hold channel d's quad (00, 01, 10, 11), bits [16:32) hold
  channel d + D/2's quad, 4 bits each, values clipped to [-7, 7] with a
  per (batch*head, channel, level) absmax/7 scale;
* the block-visit loop is v14's select-merge on the (D/2, 128) plane —
  half the gather, select and carry traffic per visit;
* post-loop, the eight nibbles sign-extend via shift pairs
  (``(g << k) >> 28``), the bilinear/attention weighting and sel-matmul
  run per channel-half, and the two (qpg, D/2) halves concatenate along
  lanes (channel order restored by construction).

Numerics: int4 quantization is ~16x coarser than v12/v14's int8.  The
incoherent rounding noise largely averages across the ~12 weighted taps
per (query, head) output, but this kernel is only eligible as a serving
fast path if the measured full-model R@K/mR@K delta on a trained
checkpoint is at threshold-noise level (tools/ab_kernel_precision.py);
see README perf notes for the measured verdict.  Parity tests pin the
kernel EXACTLY to the row-gather reference evaluated on identically
int4-dequantized values (tests/test_pallas_deform_v16.py).

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

from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up
from pairnet_tpu.ops.pallas_deform_attn_v10 import _group_taps_quad

TQ = int(_os.environ.get("PAIRNET_DEFORM16_TQ", "256"))
UNROLL = int(_os.environ.get("PAIRNET_DEFORM16_UNROLL", "2"))
BLK = 128


def _qp16_kernel(v_ref, scale_ref, out_ref, *, shapes, lvl_offs, s_pads):
    """Fused int4 quantize + pair-channel quad-pack of the value plane.

    Same structure as v12's ``_qp_kernel`` (one VMEM-resident pass, in-
    register lane shifts); each level's slice is quantized and packed
    independently, so cross-level pollution is structurally impossible,
    and the >= w+1 zero pad reproduces the reference's zero fill at each
    level's tail.  Output rows pair channel d (low 16 bits) with channel
    d + D/2 (high 16 bits).
    """
    D = v_ref.shape[1]
    D2 = D // 2
    for lvl, (_h, w) in enumerate(shapes):
        off, sp = lvl_offs[lvl], s_pads[lvl]
        vl = v_ref[0, :, off : off + sp].astype(jnp.float32)
        scale = scale_ref[0, :, lvl : lvl + 1]  # (D, 1), absmax/7
        q = jnp.clip(jnp.round(vl / scale), -7, 7).astype(jnp.int32) & 0xF

        def nib(b, w=w, sp=sp):
            z = jnp.zeros((D2, w + 1), jnp.int32)

            def sh(n):
                return jnp.concatenate([b[:, n:], z[:, :n]], axis=1)

            return b | (sh(1) << 4) | (sh(w) << 8) | (sh(w + 1) << 12)

        out_ref[0, :, off : off + sp] = nib(q[:D2]) | (nib(q[D2:]) << 16)


def _quantize_pack_int4(vraw, scales_dl, shapes, lvl_offs, s_pads):
    """(BH, D, S_pad_total) raw plane + (BH, D, L) scales -> (BH, D/2, S) i32."""
    BH, D, S_pad = vraw.shape
    kern = functools.partial(
        _qp16_kernel, shapes=shapes, lvl_offs=lvl_offs, s_pads=s_pads
    )
    return pl.pallas_call(
        kern,
        grid=(BH,),
        in_specs=[
            pl.BlockSpec((1, D, S_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D, len(shapes)), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, D // 2, S_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, D // 2, S_pad), jnp.int32),
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
    D2 = v_ref.shape[1]
    D = 2 * D2
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

    outs_a = [jnp.zeros((qpg, D2), jnp.float32) for _ in range(ng)]
    outs_b = [jnp.zeros((qpg, D2), jnp.float32) for _ in range(ng)]
    for lvl in range(L):
        h, w = shapes[lvl]
        idx_all, k00a, k01a, k10a, k11a = _group_taps_quad(
            x_ref[0, lvl], y_ref[0, lvl], a_ref[0, lvl], h, w
        )
        idx_all = idx_all + lvl_offs[lvl]
        count = counts_ref[tile * L + lvl]
        # visit-invariant in-block offset / block id (same hoist as v14)
        lo_all = idx_all & (BLK - 1)
        hi_all = idx_all >> 7

        def visit(graw, j, k, lo_all=lo_all, hi_all=hi_all, lvl=lvl):
            b0 = jnp.minimum(
                bases_ref[(tile * L + lvl) * ng + j] + k * BLK, max_b0
            )
            b0 = pl.multiple_of(b0, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]
            inb = hi_all[j : j + 1] == (b0 >> 7)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo_all[j : j + 1], (D2, BLK)), axis=1
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

        graws = tuple(jnp.zeros((D2, BLK), jnp.int32) for _ in range(ng))
        graws = jax.lax.fori_loop(
            0, (count + UNROLL - 1) // UNROLL, blk_body, graws
        )

        # nibble extraction + weighting + reduction once per (level, group)
        scale_a = scale_ref[0, lvl, :D2].reshape(1, D2)
        scale_b = scale_ref[0, lvl, D2:].reshape(1, D2)
        for j in range(ng):
            g = graws[j]
            k00, k01 = k00a[j : j + 1], k01a[j : j + 1]
            k10, k11 = k10a[j : j + 1], k11a[j : j + 1]
            acc_a = (
                ((g << 28) >> 28).astype(jnp.float32) * k00
                + ((g << 24) >> 28).astype(jnp.float32) * k01
                + ((g << 20) >> 28).astype(jnp.float32) * k10
                + ((g << 16) >> 28).astype(jnp.float32) * k11
            )
            acc_b = (
                ((g << 12) >> 28).astype(jnp.float32) * k00
                + ((g << 8) >> 28).astype(jnp.float32) * k01
                + ((g << 4) >> 28).astype(jnp.float32) * k10
                + (g >> 28).astype(jnp.float32) * k11
            )
            res_a = jax.lax.dot_general(
                sel, acc_a, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            res_b = jax.lax.dot_general(
                sel, acc_b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs_a[j] = outs_a[j] + res_a * scale_a
            outs_b[j] = outs_b[j] + res_b * scale_b

    for j in range(ng):
        out_ref[0, j * qpg : (j + 1) * qpg, :] = jnp.concatenate(
            [outs_a[j], outs_b[j]], axis=1
        ).astype(out_ref.dtype)


def _weighted_gather_v16(values_p, scales, xg, yg, ag, bases, counts, shapes, lvl_offs):
    BH, D2, S_pad = values_p.shape
    D = 2 * D2
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
                (1, D2, S_pad), lambda b, q, *_: (b, 0, 0),
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


def _ms_deform_attn_v16_impl(value, spatial_shapes, locs, weights):
    """Prep identical to v12/v14's (one plane-major relayout, fused
    quantize+pack, per-(tile, level, group) windows) with the int4 /7
    scale; see pallas_deform_attn_v12.py for the layout rationale."""
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
            / 7.0,
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
        counts_l.append(jnp.max(nblk, axis=-1))

    vraw = jnp.concatenate(planes_raw, axis=2)
    scales_dl = jnp.concatenate(scales_l, axis=2)  # (BH, D, L)
    vp = _quantize_pack_int4(
        vraw, scales_dl, tuple(spatial_shapes), tuple(lvl_offs), tuple(s_pads)
    )
    scales = scales_dl.transpose(0, 2, 1)  # (BH, L, D)
    xg = jnp.concatenate(xs, axis=1)
    yg = jnp.concatenate(ys, axis=1)
    ag = jnp.concatenate(aws, axis=1)
    bases = jnp.concatenate(bases_l, axis=2)
    counts = jnp.concatenate(counts_l, axis=2)

    sampled = _weighted_gather_v16(
        vp, scales, xg, yg, ag, bases, counts,
        tuple(spatial_shapes), tuple(lvl_offs),
    )
    out = sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v16(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v16_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v16_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v16.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v16",
        lambda v, s, l, w: ms_deform_attn_pallas_v16(v, s, l, w),
    )


register()
