"""Pallas TPU multi-scale deformable attention, v13 ("flat coords").

v12 (pallas_deform_attn_v12.py) still pays ~5 ms/layer of XLA-side
coordinate plumbing at bench geometry: the (B, Q, H, L, P, 2) sampling
locations and (B, Q, H, L, P) softmaxed weights have 4- and 2-wide minor
dims that tile terribly on TPU, and regrouping them into kernel lane
order costs nine strided transposes per layer.

v13 never materializes those tensors. The attention module hands over the
RAW projection outputs — sampling-offset logits (B, Q, H*L*P*2), attention
logits (B, Q, H*L*P), and the (Q, 2) reference points. One clean
(B, Q, C) -> (C, B, Q) transpose (minor axis Q on both sides of every
subsequent op) yields a slab (B*H, ROWS, Qp) holding per-(level, point)
PIXEL-coordinate rows ``ref * size - 0.5 + offset`` (mmcv encoder
semantics: offsets are in target-level cells; the transposed-plane xy swap
is a static row choice) and the raw attention logits. In-kernel:

* softmax of the 12 (level, point) attention logits per head — a sublane
  reduction over a (12, TQ) tile;
* gather groups are PER-POINT: one group = one sampling point x 128
  consecutive queries, so a group's tap row is a contiguous 128-lane
  SLICE of a slab row — no lane interleave anywhere — and the
  taps->queries reduction is one identity matmul (transpose) per
  (level, half) after summing the four point accumulators.

Per-group block windows (v11 semantics) are computed in XLA as segment
min/max over the well-tiled coordinate rows and scalar-prefetched — an
earlier in-kernel variant computed them with ~48 lane->scalar reductions
per tile and cost +5.4 ms/layer; keep meta on the scalar-prefetch path.

The value path (int8 row quantization, quad packing, concatenated level
planes, in-kernel scale fold, bf16 output) is v12's. Numerics: identical
quantization; softmax in f32 with max-subtraction exactly like
jax.nn.softmax; per-tap weights identical; only the reduction bracketing
differs (four per-point f32 accumulators summed post-loop). Inference-only:
training keeps the exact-backward v6/v7 dispatch (this op has no VJP).

MEASURED RESULT (v5e, bench.py): 26.0 img/s e2e vs v12's 27.8 — a
documented NEGATIVE result (kept like v8/v9). The eliminated coordinate
relayouts were largely hidden by XLA's async scheduling, while the
per-POINT gather groups pay real kernel time: a coarse-origin group of
128 consecutive stride-32 queries spans ~20 stride-8 rows on level 0
(vs ~9 for v12's 32-query x 4-point groups), so cross-level windows
widen ~2x. An earlier variant computing windows in-kernel via
lane->scalar reductions was another -5.4 ms/layer on top. The dispatcher
never auto-selects v13; PAIRNET_DEFORM_IMPL=pallas_v13 opts in (classic
interface callers fall back to v12).

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
from pairnet_tpu.ops.pallas_deform_attn_v10 import (
    _group_taps_quad,
    _pack_quads,
    _quantize_rows,
)

TQ = int(_os.environ.get("PAIRNET_DEFORM13_TQ", "256"))
BLK = 128
QG = 128  # queries per point-group (one slab-row slice)


def _kernel(
    bases_ref,
    counts_ref,
    x_ref,
    v_ref,
    scale_ref,
    out_ref,
    *,
    shapes,
    lvl_offs,
    s_pad,
    nqt,
    L,
    P,
):
    D = v_ref.shape[1]
    halves = TQ // QG
    max_b0 = s_pad - BLK
    b, q = pl.program_id(0), pl.program_id(1)
    tile = b * nqt + q

    slab = x_ref[0]  # (ROWS, TQ) f32: x_pix rows, y_pix rows, attn logits

    # softmax over the L*P attention logits (sublane reduction)
    logits = slab[2 * L * P : 3 * L * P]  # (LP, TQ)
    m = jnp.max(logits, axis=0, keepdims=True)
    e = jnp.exp(logits - m)
    aw_all = e / jnp.sum(e, axis=0, keepdims=True)  # (LP, TQ)

    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (QG, BLK), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (QG, BLK), 1)
    ).astype(jnp.float32)

    outs = [jnp.zeros((QG, D), jnp.float32) for _ in range(halves)]
    for lvl in range(L):
        h, w = shapes[lvl]
        point_taps = []
        for p in range(P):
            r = lvl * P + p
            x_pix = slab[r : r + 1]
            y_pix = slab[L * P + r : L * P + r + 1]
            aw = aw_all[r : r + 1]
            idx, k00, k01, k10, k11 = _group_taps_quad(x_pix, y_pix, aw, h, w)
            point_taps.append((idx + lvl_offs[lvl], k00, k01, k10, k11))

        for hh in range(halves):
            sl = slice(hh * QG, (hh + 1) * QG)
            groups = []
            for p in range(P):
                idx, k00, k01, k10, k11 = point_taps[p]
                base = bases_ref[((tile * L + lvl) * halves + hh) * P + p]
                groups.append(
                    (base, idx[:, sl], k00[:, sl], k01[:, sl], k10[:, sl], k11[:, sl])
                )
            count = counts_ref[(tile * L + lvl) * halves + hh]

            def blk_body(k, accs, groups=groups):
                out = []
                for p in range(P):
                    base, idx_g, k00, k01, k10, k11 = groups[p]
                    b0 = jnp.minimum(base + k * BLK, max_b0)
                    b0 = pl.multiple_of(b0, BLK)
                    vbt = v_ref[0, :, pl.ds(b0, BLK)]
                    rel = idx_g - b0
                    inb = (rel >= 0) & (rel < BLK)
                    lo_i = jnp.clip(rel, 0, BLK - 1)
                    g = jnp.take_along_axis(
                        vbt, jnp.broadcast_to(lo_i, (D, BLK)), axis=1
                    )
                    b00 = ((g << 24) >> 24).astype(jnp.float32)
                    b01 = ((g << 16) >> 24).astype(jnp.float32)
                    b10 = ((g << 8) >> 24).astype(jnp.float32)
                    b11 = (g >> 24).astype(jnp.float32)
                    out.append(
                        accs[p]
                        + b00 * jnp.where(inb, k00, 0.0)
                        + b01 * jnp.where(inb, k01, 0.0)
                        + b10 * jnp.where(inb, k10, 0.0)
                        + b11 * jnp.where(inb, k11, 0.0)
                    )
                return tuple(out)

            accs = tuple(jnp.zeros((D, BLK), jnp.float32) for _ in range(P))
            accs = jax.lax.fori_loop(0, count, blk_body, accs)
            accsum = accs[0] + accs[1] + accs[2] + accs[3]
            res = jax.lax.dot_general(
                eye, accsum, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (QG, D) — transpose of the (D, QG) accumulator
            scale_row = scale_ref[0, lvl, :].reshape(1, D)
            outs[hh] = outs[hh] + res * scale_row

    for hh in range(halves):
        out_ref[0, hh * QG : (hh + 1) * QG, :] = outs[hh].astype(out_ref.dtype)


def ms_deform_attn_flat(
    value,
    spatial_shapes,
    offset_logits,
    attn_logits,
    reference_points,
    swap_offset_xy=False,
):
    """Flat-coords fused deformable attention (inference fast path).

    value:            (B, S, H, D)
    offset_logits:    (B, Q, H*L*P*2) raw sampling_offsets projection,
                      minor order (h, l, p, xy), offsets in LEVEL CELLS
                      (encoder semantics: loc = ref + off/normalizer)
    attn_logits:      (B, Q, H*L*P) raw attention_weights projection
                      (softmax over L*P happens in-kernel)
    reference_points: (Q, 2) or (B, Q, 2) normalized (x, y), shared
                      across levels (encoder convention)
    Returns (B, Q, H*D) bf16.
    """
    B, S, H, D = value.shape
    Q = offset_logits.shape[1]
    L = len(spatial_shapes)
    P = attn_logits.shape[2] // (H * L)
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    Qp = _round_up(Q, TQ)
    nqt = Qp // TQ
    halves = TQ // QG

    if reference_points.ndim == 2:
        reference_points = jnp.broadcast_to(reference_points[None], (B, Q, 2))

    # ---- value planes: v12's path (quantize + quad-pack per level) ----
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    vT = (
        value.reshape(B, S, H * D)
        .transpose(2, 0, 1)
        .reshape(H, D, B, S)
        .transpose(2, 0, 1, 3)
        .reshape(B * H, D, S)
    )
    planes, scales_l, lvl_offs = [], [], []
    pos = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad_l = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(vT, offs[lvl], S_l, axis=2)
        q8, scale = _quantize_rows(vl)
        planes.append(
            jnp.pad(_pack_quads(q8, w), ((0, 0), (0, 0), (0, S_pad_l - S_l)))
        )
        scales_l.append(scale.reshape(B * H, 1, D))
        lvl_offs.append(pos)
        pos += S_pad_l
    vp = jnp.concatenate(planes, axis=2)
    scales = jnp.concatenate(scales_l, axis=1)

    # ---- coordinate slab: one clean (B, Q, C) -> (C, B, Q) transpose ----
    n_off = L * P * 2
    n_attn = L * P
    flat = jnp.concatenate(
        [offset_logits, attn_logits], axis=-1
    ).astype(jnp.float32)  # (B, Q, H*(n_off+n_attn)), minor order h-major
    flat_t = flat.transpose(2, 0, 1)  # (H*(n_off+n_attn), B, Q): minor Q
    off_t = flat_t[: H * n_off].reshape(H, L, P, 2, B, Q)
    attn_t = flat_t[H * n_off :].reshape(H, n_attn, B, Q)
    ref_t = reference_points.astype(jnp.float32).transpose(2, 0, 1)  # (2,B,Q)

    cx, cy = (1, 0) if swap_offset_xy else (0, 1)
    wvec = jnp.asarray(
        [w for _, w in spatial_shapes], jnp.float32
    ).reshape(1, L, 1, 1, 1)
    hvec = jnp.asarray(
        [h for h, _ in spatial_shapes], jnp.float32
    ).reshape(1, L, 1, 1, 1)
    # pixel coords per (h, l, p): ref*size - 0.5 + offset (offset in cells)
    x_pix = ref_t[0] * wvec - 0.5 + off_t[:, :, :, cx]  # (H, L, P, B, Q)
    y_pix = ref_t[1] * hvec - 0.5 + off_t[:, :, :, cy]

    # per-group windows (v11 semantics) as well-tiled segment reductions
    def flat_idx(xp, yp, lvl):
        h, w = spatial_shapes[lvl]
        x0 = jnp.clip(jnp.floor(xp).astype(jnp.int32), 0, w - 1)
        y0 = jnp.clip(jnp.floor(yp).astype(jnp.int32), 0, h - 1)
        return y0 * w + x0 + lvl_offs[lvl]

    xq = jnp.pad(x_pix.reshape(H, L, P, B, Q), ((0,) * 2,) * 4 + ((0, Qp - Q),))
    yq = jnp.pad(y_pix.reshape(H, L, P, B, Q), ((0,) * 2,) * 4 + ((0, Qp - Q),))
    idx_rows = jnp.stack(
        [flat_idx(xq[:, l], yq[:, l], l) for l in range(L)], axis=1
    )  # (H, L, P, B, Qp)
    seg = idx_rows.reshape(H, L, P, B, nqt * halves, QG)
    lo = jnp.min(seg, axis=-1)  # (H, L, P, B, T)
    hi = jnp.max(seg, axis=-1)
    base = lo // BLK * BLK
    nblk = (hi - base) // BLK + 1
    # kernel meta order: [((tile*L + lvl)*halves + hh)*P + p]
    base = base.reshape(H, L, P, B, nqt, halves)
    nblk = nblk.reshape(H, L, P, B, nqt, halves)
    bases = base.transpose(3, 0, 4, 1, 5, 2).reshape(B * H, nqt, L, halves, P)
    counts = jnp.max(
        nblk.transpose(3, 0, 4, 1, 5, 2), axis=-1
    ).reshape(B * H, nqt, L, halves)

    rows = 2 * L * P + n_attn
    rows_pad = _round_up(rows, 8)
    slab = jnp.concatenate(
        [
            x_pix.reshape(H, L * P, B, Q),
            y_pix.reshape(H, L * P, B, Q),
            attn_t,
        ],
        axis=1,
    )  # (H, rows, B, Q)
    slab = slab.transpose(2, 0, 1, 3).reshape(B * H, rows, Q)
    slab = jnp.pad(slab, ((0, 0), (0, rows_pad - rows), (0, Qp - Q)))

    kern = functools.partial(
        _kernel,
        shapes=spatial_shapes,
        lvl_offs=tuple(lvl_offs),
        s_pad=pos,
        nqt=nqt,
        L=L,
        P=P,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B * H, nqt),
        in_specs=[
            pl.BlockSpec(
                (1, rows_pad, TQ), lambda b, q, *_: (b, 0, q),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, pos), lambda b, q, *_: (b, 0, 0),
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
    sampled = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, Qp, D), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(bases.reshape(-1), counts.reshape(-1), slab, vp, scales)

    out = sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)
