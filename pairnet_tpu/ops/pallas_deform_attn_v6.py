"""Pallas TPU multi-scale deformable attention, v6 ("LUT block gather").

Replaces the soft-N-hot one-hot matmul (v2-v5) with the VPU's hardware
dynamic-gather (``tpu.dynamic_gather``, reached via take_along_axis):
a per-sublane-row 128-lane table lookup. Probed contract on v5e: source
and index shapes must match, and the gathered dimension must span a
single vreg (lanes <= 128).

Algorithm, per (batch*head, 64-query tile):
  * coords arrive in gather-group lane layout (group, qpg*P lanes); the 16
    tap indices/weights per query (4 points x 4 bilinear corners) are
    derived per group on (1, 32) registers and lane-concatenated to
    (1, 128) tap vectors — no cross-tiling reshapes;
  * the value plane arrives pre-transposed (D, S_pad); blocks are
    128-aligned lane slices (D, 128);
  * scan ceil(span/128) blocks from the 128-aligned minimum tap index
    (EXACT for arbitrary offsets); per block and group, one (D, 128)
    lane-gather fetches every tap's channel column; accumulate
    gather * (weight masked to this block);
  * reduce taps -> queries with one static 0/1 matmul over tap lanes.

Why it wins: the one-hot build costs ~3 vector ops per tap per WINDOW
COLUMN; the LUT gather costs ~2 vector ops per tap per 128-BLOCK — work
scales with the actual tap span, not the padded window. It is also exact
in f32 (no bf16 one-hot rounding as in v2).

The per-tile block range (base, count) is precomputed in XLA and fed via
scalar prefetch, so the kernel never stalls on an in-kernel scalar
reduction.

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

import os as _os
TQ = int(_os.environ.get("PAIRNET_DEFORM6_TQ", "128"))  # queries per tile (128: 14% over 64 at realistic offsets)
BLK = 128  # value block = one vreg of lanes


def _cdiv(a, b):
    return -(-a // b)


def _round_up(a, b):
    return _cdiv(a, b) * b


def _group_taps(x, y, aw, h, w):
    """x/y/aw (ng, qpg*P) f32 lane-layout -> idx (ng, 128) i32, wts (ng, 128).

    Computed for ALL groups in one (ng, qpg*P) pass (one vreg per op).
    Tap lane = corner * (qpg*P) + q_local * P + p.
    """
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    idxs = []
    wts = []
    for dy, dx, cw in (
        (0, 0, (1 - fy) * (1 - fx)),
        (0, 1, (1 - fy) * fx),
        (1, 0, fy * (1 - fx)),
        (1, 1, fy * fx),
    ):
        xi = x0i + dx
        yi = y0i + dy
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idxs.append(jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1))
        wts.append((cw * aw * ok).astype(jnp.float32))
    return jnp.concatenate(idxs, -1), jnp.concatenate(wts, -1)


def _kernel(meta_ref, x_ref, y_ref, a_ref, v_ref, out_ref, *, h, w, nqt):
    D = v_ref.shape[1]
    ng = x_ref.shape[1]  # gather groups per tile
    gp = x_ref.shape[2]  # qpg * P lanes per group
    qpg = TQ // ng
    P = gp // qpg
    b, q = pl.program_id(0), pl.program_id(1)

    # taps -> queries selector: lane = corner*gp + q_local*P + p
    lane = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 1)
    qrow = jax.lax.broadcasted_iota(jnp.int32, (qpg, BLK), 0)
    sel = ((lane % gp) // P == qrow).astype(jnp.float32)  # (qpg, 128)

    idx_all, w_all = _group_taps(x_ref[0], y_ref[0], a_ref[0], h, w)
    taps = [
        (idx_all[j : j + 1], w_all[j : j + 1]) for j in range(ng)
    ]
    # TILE-level union block range (packed base_blk << 12 | nblk in a flat
    # SMEM array — 2D prefetch pads the minor dim to 128). Per-group ranges
    # were measured 3x SLOWER: the per-block fixed cost (dynamic slice +
    # loop overhead ~90 cycles) then multiplies by ng, while the offset
    # y-spread keeps per-group counts nearly as high as the union.
    m = meta_ref[b * nqt + q]
    base = (m >> 12) * BLK
    nblk = m & 0xFFF

    def blk_body(k, accs):
        b0 = pl.multiple_of(base + k * BLK, BLK)
        # f32 block: the hardware gather requires index/result bitwidths to
        # match (bf16 sources are upcast here; plane stays bf16 in VMEM)
        vbt = v_ref[0, :, pl.ds(b0, BLK)].astype(jnp.float32)
        out = []
        for j in range(ng):
            idx_j, w_j = taps[j]
            rel = idx_j - b0  # (1, 128) i32
            inb = (rel >= 0) & (rel < BLK)
            wk = jnp.where(inb, w_j, 0.0)  # (1, 128)
            lo = jnp.clip(rel, 0, BLK - 1)
            g = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )  # (D, 128)
            out.append(accs[j] + g * wk)
        return tuple(out)

    accs = tuple(jnp.zeros((D, BLK), jnp.float32) for _ in range(ng))
    accs = jax.lax.fori_loop(0, nblk, blk_body, accs)

    for j in range(ng):
        # (qpg, 128t) x (D, 128t) -> (qpg, D), contracting the tap lanes
        res = jax.lax.dot_general(
            sel, accs[j], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, j * qpg : (j + 1) * qpg, :] = res


def _weighted_gather_v6(values_t, xg, yg, ag, base, nblk, h, w):
    """values_t (BH, D, S_pad); xg/yg/ag (BH, n_groups, qpg*P) lane-layout;
    base/nblk (BH, nqt) i32 per query tile -> (BH, Qp, D) f32."""
    BH, D, S_pad = values_t.shape
    n_groups, gp = xg.shape[1], xg.shape[2]
    assert gp * 4 == BLK, (gp, BLK)  # each group fills 128 tap lanes
    nqt = base.shape[1]
    ng = n_groups // nqt
    meta = ((base // BLK) << 12 | nblk).reshape(-1)  # nblk <= S/128 < 4096
    kern = functools.partial(_kernel, h=h, w=w, nqt=nqt)
    coord_spec = pl.BlockSpec(
        (1, ng, gp), lambda b, q, *_: (b, q, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # packed (base_blk << 12 | nblk) per group
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
    )(meta, xg, yg, ag, values_t)


def _ms_deform_attn_v6_impl(value, spatial_shapes, locs, weights):
    B, S, H, D = value.shape
    Q = locs.shape[1]
    P = locs.shape[4]
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    qpg = BLK // (4 * P)  # queries per gather group
    Qp = _round_up(Q, TQ)

    out = jnp.zeros((B, Q, H, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        S_l = h * w
        S_pad = _round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(value, offs[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)  # (BH, D, S)
        vl = jnp.pad(vl, ((0, 0), (0, 0), (0, S_pad - S_l)))

        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = weights[..., lvl, :].astype(jnp.float32)

        def to_groups(t):
            """(B, Q, H, P) -> (BH, n_groups, qpg*P) lane layout."""
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        # per-tile block range with the kernel's corner clamping: the min
        # corner is the clamped base corner, the max is the clamped
        # (y0+1, x0+1) corner
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        flat_lo = (jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1))
        flat_hi = (jnp.clip(y0 + 1, 0, h - 1) * w + jnp.clip(x0 + 1, 0, w - 1))
        nqt = Qp // TQ
        lo = jnp.min(flat_lo.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat_hi.reshape(B * H, nqt, TQ * P), axis=-1)
        base = jnp.maximum(lo, 0) // BLK * BLK
        nblk = (hi - base) // BLK + 1  # (BH, nqt)

        sampled = _weighted_gather_v6(vl, xb, yb, ab, base, nblk, h, w)
        out = out + sampled[:, :Q].reshape(B, H, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, H * D)


# --------------------------- backward kernel ---------------------------
#
# out[q, d] = sum_taps w_t(aw, fx, fy) * V[i_t, d] with w_t = cw(fx, fy) *
# aw * ok. Per (bh, query tile) the same block machinery runs in reverse:
#   dV[i, d]  += sum_t (lo_t == i) * g_tap[d, t] * w_t   (one-hot MATMUL,
#                accumulated into a revisited full-plane output block)
#   d w_t      = sum_d g_tap[d, t] * V[i_t, d]           (gather + reduce)
#   d aw, d fx, d fy via the bilinear-factor chain rule on coord-layout
#   registers. Out-of-plane corners (ok=0) pass no gradient, matching the
#   mmcv CUDA kernel (SURVEY.md §2.4).


def _bilinear_factors(x, y, h, w):
    """Per-corner (cw, dcw/dfx, dcw/dfy, ok, flat idx) on coord layout."""
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    out = []
    for dy, dx, cw, dfx, dfy in (
        (0, 0, (1 - fy) * (1 - fx), -(1 - fy), -(1 - fx)),
        (0, 1, (1 - fy) * fx, (1 - fy), -fx),
        (1, 0, fy * (1 - fx), -fy, (1 - fx)),
        (1, 1, fy * fx, fy, fx),
    ):
        xi = x0i + dx
        yi = y0i + dy
        ok = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)).astype(jnp.float32)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        out.append((flat, cw, dfx, dfy, ok))
    return out


def _bwd_kernel(
    meta_ref, x_ref, y_ref, a_ref, it_ref, v_ref, g_ref,
    dv_ref, dx_ref, dy_ref, da_ref, *, h, w, nqt,
):
    D = v_ref.shape[1]
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
    sel = ((lane % gp) // P == qrow).astype(jnp.float32)  # (qpg, 128)

    m = meta_ref[b * nqt + q]
    base = (m >> 12) * BLK
    nblk = m & 0xFFF

    # expand upstream grads to tap lanes: g_tap[j][d, t] = g[q(t), d]
    g_taps = []
    gw = []
    for j in range(ng):
        g_grp = g_ref[0, j * qpg : (j + 1) * qpg, :]  # (qpg, D)
        gt = jax.lax.dot_general(
            g_grp, sel, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (D, 128)
        g_taps.append(gt)
        # block-INDEPENDENT dV operand: the one-hot compare below already
        # zeroes out-of-block taps, so g*w hoists out of the block loop
        gw.append(gt * w_all[j : j + 1])

    pos = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)

    def blk_body(k, dws):
        b0 = pl.multiple_of(base + k * BLK, BLK)
        vbt = v_ref[0, :, pl.ds(b0, BLK)].astype(jnp.float32)  # (D, 128)
        dvb = jnp.zeros((D, BLK), jnp.float32)
        out = []
        for j in range(ng):
            rel = idx_all[j : j + 1] - b0  # (1, 128)
            inb = ((rel >= 0) & (rel < BLK)).astype(jnp.float32)
            lo = jnp.clip(rel, 0, BLK - 1)
            gathered = jnp.take_along_axis(
                vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
            )
            # d w_t = sum_d g_tap * V[i_t]  (only when in this block)
            dw_blk = jnp.sum(g_taps[j] * gathered, axis=0, keepdims=True)
            out.append(dws[j] + dw_blk * inb)
            # dV[pos] += onehot^T-weighted tap grads.  The one-hot is
            # built from the PRE-TRANSPOSED tap indices (taps in
            # sublanes, XLA-side transpose): one compare against the
            # lane iota, no in-kernel lane->sublane transpose, and
            # out-of-block taps (relT outside [0, BLK)) match no lane —
            # the dV ablation measured the old transpose+mask build at
            # 189 of 251 ms per encoder-geometry backward call.
            relT = it_ref[0, :, j : j + 1] - b0  # (128 taps, 1)
            oh = (relT == pos).astype(jnp.float32)  # (128 taps, 128 pos)
            dvb = dvb + jax.lax.dot_general(
                gw[j], oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dv_ref[0, :, pl.ds(b0, BLK)] += dvb
        return tuple(out)

    dws = tuple(jnp.zeros((1, BLK), jnp.float32) for _ in range(ng))
    dws = jax.lax.fori_loop(0, nblk, blk_body, dws)
    dw_all = jnp.concatenate(dws, 0)  # (ng, 128) d/d w_t

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
    dx_ref[0] = dfx  # d/dx: fx = x - floor(x) -> dfx/dx = 1
    dy_ref[0] = dfy


def _tap_indices_T(xg, yg, h, w, nqt):
    """4-corner flat tap indices, TRANSPOSED to tap-major sublanes.

    xg/yg (BH, n_groups, gp) pixel coords -> (BH, nqt*BLK, ng) i32 where
    row (tile*BLK + t) column j is tap-lane t of group j (lane layout
    corner*gp + inner, matching _bilinear_factors order).
    """
    BH, n_groups, gp = xg.shape
    ng = n_groups // nqt
    x0 = jnp.floor(xg).astype(jnp.int32)
    y0 = jnp.floor(yg).astype(jnp.int32)
    flats = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        flats.append(
            jnp.clip(y0 + dy, 0, h - 1) * w + jnp.clip(x0 + dx, 0, w - 1)
        )
    idx4 = jnp.concatenate(flats, -1)  # (BH, n_groups, 4*gp = BLK)
    return (
        idx4.reshape(BH, nqt, ng, BLK)
        .swapaxes(2, 3)
        .reshape(BH, nqt * BLK, ng)
    )


def _deform_bwd_v6(values_t, xg, yg, ag, g, base, nblk, h, w):
    """-> (dvalues_t, dx, dy, da) with the forward's shapes/layouts."""
    BH, D, S_pad = values_t.shape
    n_groups, gp = xg.shape[1], xg.shape[2]
    nqt = base.shape[1]
    ng = n_groups // nqt
    meta = ((base // BLK) << 12 | nblk).reshape(-1)
    idxT = _tap_indices_T(xg, yg, h, w, nqt)
    kern = functools.partial(_bwd_kernel, h=h, w=w, nqt=nqt)
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
                (1, BLK, ng), lambda b, q, *_: (b, q, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, D, S_pad), lambda b, q, *_: (b, 0, 0),
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
    )(meta, xg, yg, ag, idxT, values_t, g)


def _ms_deform_attn_v6_bwd_impl(value, spatial_shapes, locs, weights, g):
    """Full backward: returns (dvalue, dlocs, dweights)."""
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
        flat_lo = (jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1))
        flat_hi = (jnp.clip(y0 + 1, 0, h - 1) * w + jnp.clip(x0 + 1, 0, w - 1))
        nqt = Qp // TQ
        lo = jnp.min(flat_lo.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat_hi.reshape(B * H, nqt, TQ * P), axis=-1)
        base = jnp.maximum(lo, 0) // BLK * BLK
        nblk = (hi - base) // BLK + 1

        dvl, dxg, dyg, dag = _deform_bwd_v6(
            vl, xb, yb, ab, g, base, nblk, h, w
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
        # x = locx * w - 0.5 -> dlocx = dx * w
        dlocs = dlocs.at[..., lvl, :, 0].set(from_groups(dxg) * w)
        dlocs = dlocs.at[..., lvl, :, 1].set(from_groups(dyg) * h)
        dweights = dweights.at[..., lvl, :].set(from_groups(dag))
    return (
        dvalue.astype(value.dtype),
        dlocs.astype(locs.dtype),
        dweights.astype(weights.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def ms_deform_attn_pallas_v6(value, spatial_shapes, locs, weights):
    return _ms_deform_attn_v6_impl(value, spatial_shapes, locs, weights)


def _fwd(value, spatial_shapes, locs, weights):
    out = _ms_deform_attn_v6_impl(value, spatial_shapes, locs, weights)
    return out, (value, locs, weights)


def _bwd(spatial_shapes, res, g):
    value, locs, weights = res
    # per-group-window backward on the saved full-precision inputs
    # (PAIRNET_DEFORM_BWD=v6 restores the tile-union kernel)
    from pairnet_tpu.ops.pallas_deform_bwd2 import deform_attn_bwd

    return deform_attn_bwd(value, spatial_shapes, locs, weights, g)


ms_deform_attn_pallas_v6.defvjp(_fwd, _bwd)


def register():
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    register_pallas_impl(
        "pallas_v6",
        lambda v, s, l, w: ms_deform_attn_pallas_v6(v, s, l, w),
    )


register()
