"""Pallas TPU deformable-attention backward, v3 ("bf16 pair-packed").

The bwd2 kernel (pallas_deform_bwd2.py) is the per-group-window backward;
round-5 measurement puts the whole backward at ~556 ms of a 769 ms batch-4
bf16 train step. Inside bwd2's visit loop the costs mirror the forward's
round-4 attribution (docs/kernel_notes.md): the (D, 128) f32 value gather
for dw (4 VREGs through the ~7-stage lane-shift network), the f32
select-merge carries, and two f32 MXU matmuls (the g-expansion and the
one-hot dV scatter) that run at the MXU's slow f32 rate.

bwd3 applies the forward's v7/v16 packing lesson to the backward, for the
**bf16-compute training path** (trainer compute_dtype=bf16, where the
forward already samples bf16 values via v7 — the values are exactly
bf16-representable, so packing loses nothing):

* the value plane packs channel pairs (d, d + D/2) as two bf16 halves per
  int32 lane: the dw gather and the select-merge carries move (D/2, 128)
  int32 — HALF of bwd2's f32 traffic; halves unpack post-loop by pure bit
  extension (``g << 16`` / ``g & 0xffff0000`` bitcast to f32);
* the one-hot dV matmul and the upstream-grad expansion run with bf16
  operands and f32 accumulation (``preferred_element_type=f32``) — full
  MXU rate; the one-hot is exact in bf16 (0/1), so the only rounding is
  the upstream grad's bf16 cast (~2^-8 relative, the same rounding every
  bf16 matmul in the mixed-precision step already applies);
* everything else (per-group windows, shared max count, clamped zero-pad
  overshoot) is bwd2 unchanged.

Numerics vs bwd2 on bf16-representable values: dw/dlocs/dweights exact up
to f32 reassociation; dvalue carries the upstream-grad bf16 rounding.
Parity test: tests/test_deform_bwd3.py. Select via PAIRNET_DEFORM_BWD=v3;
the f32-exact anchors (v2/v6) remain for f32 training.

Ref: mmcv MultiScaleDeformableAttention backward semantics (SURVEY.md
§2.4): out-of-plane corners pass no gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_deform_attn_v6 import (
    BLK,
    TQ,
    _bilinear_factors,
    _round_up,
    _tap_indices_T,
)


def _bwd3_kernel(
    bases_ref, counts_ref, x_ref, y_ref, a_ref, it_ref, v_ref, g_ref,
    dv_ref, dx_ref, dy_ref, da_ref, *, h, w, nqt, s_pad,
):
    Dh = v_ref.shape[1]  # D/2 packed rows
    D = 2 * Dh
    ng = x_ref.shape[1]
    gp = x_ref.shape[2]
    qpg = TQ // ng
    P = gp // qpg
    b, q = pl.program_id(0), pl.program_id(1)

    @pl.when(q == 0)
    def _():
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    x = x_ref[0]
    y = y_ref[0]
    aw = a_ref[0]
    corners = _bilinear_factors(x, y, h, w)  # 4 x (ng, gp) tensors
    # tap-lane layout: lane = corner*gp + (q_local*P + p)
    idx_all = jnp.concatenate([c[0] for c in corners], -1)  # (ng, 128)
    w_all = jnp.concatenate(
        [(c[1] * aw * c[4]) for c in corners], -1
    ).astype(jnp.float32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 0)
    sel = ((lane % gp) // P == qrow).astype(jnp.bfloat16)  # (qpg, 128)

    tile = b * nqt + q
    count = counts_ref[tile]
    max_b0 = s_pad - BLK

    # expand upstream grads to tap lanes: g_tap[j][d, t] = g[q(t), d]
    # bf16 operands, f32 accumulation (full MXU rate; sel is exact 0/1)
    g_taps = []
    gw = []
    for j in range(ng):
        g_grp = g_ref[0, j * qpg : (j + 1) * qpg, :].astype(jnp.bfloat16)
        gt = jax.lax.dot_general(
            g_grp, sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, 128) f32
        g_taps.append(gt)
        gw.append((gt * w_all[j : j + 1]).astype(jnp.bfloat16))

    pos = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def blk_body(k, gats):
        out = []
        for j in range(ng):
            b0 = jnp.minimum(bases_ref[tile * ng + j] + k * BLK, max_b0)
            b0 = pl.multiple_of(b0, BLK)
            vbt = v_ref[0, :, pl.ds(b0, BLK)]  # (D/2, 128) i32 packed
            rel = idx_all[j : j + 1] - b0  # (1, 128)
            inb = (rel & ~(BLK - 1)) == 0
            lo = rel & (BLK - 1)
            gth = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (Dh, BLK)), axis=1
            )
            # select-merge on the packed words: window blocks are
            # disjoint, each tap's column is picked exactly once
            out.append(jnp.where(inb, gth, gats[j]))
            # dV[pos] += one-hot^T weighted tap grads for THIS block;
            # out-of-block taps match no lane; bf16 one-hot is exact
            relT = it_ref[0, :, j : j + 1] - b0  # (128 taps, 1)
            oh = (relT == pos).astype(jnp.bfloat16)  # (128 taps, 128 pos)
            dvb = jax.lax.dot_general(
                gw[j], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dv_ref[0, :, pl.ds(b0, BLK)] += dvb
        return tuple(out)

    gats = tuple(jnp.zeros((Dh, BLK), jnp.int32) for _ in range(ng))
    gats = jax.lax.fori_loop(0, count, blk_body, gats)

    # d w_t = sum_d g_tap[d, t] * V[i_t, d] — unpack the merged packed
    # columns once (bf16 halves are f32 bit prefixes) and reduce
    dw_rows = []
    for j in range(ng):
        v_lo = jax.lax.bitcast_convert_type(gats[j] << 16, jnp.float32)
        v_hi = jax.lax.bitcast_convert_type(
            gats[j] & jnp.int32(-65536), jnp.float32
        )
        dw_j = jnp.sum(
            g_taps[j][:Dh] * v_lo + g_taps[j][Dh:] * v_hi,
            axis=0,
            keepdims=True,
        )
        dw_rows.append(dw_j)
    dw_all = jnp.concatenate(dw_rows, 0)  # (ng, 128)

    # chain rule back to aw / fx / fy on coord layout (ng, gp) slices
    da = jnp.zeros((ng, gp), jnp.float32)
    dfx = jnp.zeros((ng, gp), jnp.float32)
    dfy = jnp.zeros((ng, gp), jnp.float32)
    for c, (flat, cw, dcw_dfx, dcw_dfy, ok) in enumerate(corners):
        dw_c = dw_all[:, c * gp : (c + 1) * gp]  # (ng, gp)
        da = da + dw_c * cw * ok
        dfx = dfx + dw_c * dcw_dfx * aw * ok
        dfy = dfy + dw_c * dcw_dfy * aw * ok
    da_ref[0] = da
    dx_ref[0] = dfx
    dy_ref[0] = dfy


def _pack_channel_pairs(vl):
    """(BH, D, S) f32 -> (BH, D/2, S) i32: lane holds bf16(v[d]) in the
    low half and bf16(v[d + D/2]) in the high half."""
    D = vl.shape[1]
    v16 = vl.astype(jnp.bfloat16)
    u16 = jax.lax.bitcast_convert_type(v16, jnp.uint16).astype(jnp.int32)
    return u16[:, : D // 2] | (u16[:, D // 2 :] << 16)


def _deform_bwd3(values_t, xg, yg, ag, g, bases, counts, h, w):
    """-> (dvalues_t, dx, dy, da); layouts identical to _deform_bwd2 but
    values_t arrives packed (BH, D/2, S_pad) i32 and dvalues_t is the
    full (BH, D, S_pad) f32."""
    BH, Dh, S_pad = values_t.shape
    D = 2 * Dh
    n_groups, gp = xg.shape[1], xg.shape[2]
    nqt = counts.shape[1]
    ng = n_groups // nqt
    idxT = _tap_indices_T(xg, yg, h, w, nqt)
    kern = functools.partial(_bwd3_kernel, h=h, w=w, nqt=nqt, s_pad=S_pad)
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
                (1, BLK, ng), lambda b, q, *_: (b, q, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Dh, S_pad), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, TQ, D), lambda b, q, *_: (b, q, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(  # dvalue: revisited full plane, accumulated
                (1, D, S_pad), lambda b, q, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            coord_spec,
            coord_spec,
            coord_spec,
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((BH, D, S_pad), jnp.float32),
            jax.ShapeDtypeStruct((BH, n_groups, gp), jnp.float32),
            jax.ShapeDtypeStruct((BH, n_groups, gp), jnp.float32),
            jax.ShapeDtypeStruct((BH, n_groups, gp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        bases.reshape(-1), counts.reshape(-1), xg, yg, ag, idxT, values_t, g
    )


def _ms_deform_attn_bwd3_impl(value, spatial_shapes, locs, weights, g):
    """Full backward: returns (dvalue, dlocs, dweights).

    Prep mirrors _ms_deform_attn_bwd2_impl exactly (per-group block bases,
    shared per-tile max count) with the value plane bf16 pair-packed.
    """
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    L = len(spatial_shapes)
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // (4 * P)
    Qp = _round_up(Q, TQ)

    g = g.reshape(B, Q, H, D).transpose(0, 2, 1, 3).reshape(B * H, Q, D)
    if Qp != Q:
        g = jnp.pad(g, ((0, 0), (0, Qp - Q), (0, 0)))
    g = g.astype(jnp.float32)

    dvalue = jnp.zeros((B, S, H, D), jnp.float32)
    dlocs = jnp.zeros((B, Q, H, L, P, 2), jnp.float32)
    dweights = jnp.zeros((B, Q, H, L, P), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(value, offs[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)
        vl = _pack_channel_pairs(vl.astype(jnp.float32))
        vl = jnp.pad(vl, ((0, 0), (0, 0), (0, S_pad - S_l)))

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
        flat_lo = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        flat_hi = (
            jnp.clip(y0 + 1, 0, h - 1) * w + jnp.clip(x0 + 1, 0, w - 1)
        )
        nqt = Qp // TQ
        ng = TQ // qpg
        lo_g = jnp.min(flat_lo, axis=-1)  # (BH, n_groups)
        hi_g = jnp.max(flat_hi, axis=-1)
        bases = (lo_g // BLK * BLK).reshape(B * H, nqt, ng)
        nblk = (hi_g.reshape(B * H, nqt, ng) - bases) // BLK + 1
        counts = jnp.max(nblk, axis=-1)  # (BH, nqt)

        dvl, dxg, dyg, dag = _deform_bwd3(
            vl, xb, yb, ab, g, bases, counts, h, w
        )

        def from_groups(t):
            t = t.reshape(B * H, Qp, P)[:, :Q]
            return t.reshape(B, H, Q, P).transpose(0, 2, 1, 3)

        dvl = dvl[:, :, :S_l].reshape(B, H, D, S_l).transpose(0, 3, 1, 2)
        dvalue = jax.lax.dynamic_update_slice_in_dim(
            dvalue,
            jax.lax.dynamic_slice_in_dim(dvalue, offs[lvl], S_l, 1) + dvl,
            offs[lvl], axis=1,
        )
        dlocs = dlocs.at[..., lvl, :, 0].set(from_groups(dxg) * w)
        dlocs = dlocs.at[..., lvl, :, 1].set(from_groups(dyg) * h)
        dweights = dweights.at[..., lvl, :].set(from_groups(dag))
    return (
        dvalue.astype(value.dtype),
        dlocs.astype(locs.dtype),
        dweights.astype(weights.dtype),
    )
