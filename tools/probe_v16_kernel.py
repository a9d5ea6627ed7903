#!/usr/bin/env python
"""Ablation probe of the v16 int4 pair-channel kernel's per-visit costs.

Same methodology as tools/probe_deform_kernel.py (scan-amortized variants
on staged inputs), specialized to v16's (D/2, 128) int32 planes:

  full        slice + inb + gather + select merge + nibble extract + matmuls
  nogather    gather replaced by the block's first 128 lanes
  emptyloop   loop body = carry passthrough (loop/bookkeeping cost)
  nopost      full loop, post-loop nibble extraction+matmuls -> plain sum
  onematmul   full loop, but the two channel-half matmuls fused into ONE
              (qpg, BLK) x (BLK, D) matmul on the lanewise-concatenated
              accumulators (tests whether doubled small-matmul issue
              latency is the gap vs the halved-traffic prediction)

Also times the int4 quantize+pack prep kernel standalone vs v12's int8
pack (prep is inside the full-op numbers of bench_deform_ab, not here).

Results are numerically WRONG except full — timing only.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

REPS = int(os.environ.get("BENCH_REPS", "8"))


def timed(op, args, iters=4, name=""):
    import jax
    import jax.numpy as jnp

    def chained(a0, rest):
        def body(c, _):
            s = op(c, *rest)
            return c + (1e-20 * s).astype(c.dtype), s

        c, ss = jax.lax.scan(body, a0, None, length=REPS)
        return c, jnp.sum(ss)

    cfn = jax.jit(chained)
    a0, rest = args[0], args[1:]
    c, s = cfn(a0, rest)
    _ = float(s)
    t0 = time.perf_counter()
    for _i in range(iters):
        c, s = cfn(c, rest)
    _ = float(s)
    dt = (time.perf_counter() - t0) / (iters * REPS) * 1000
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def make_kernel(variant, shapes, lvl_offs, nqt, s_pad_total, TQ, UNROLL):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from pairnet_tpu.ops.pallas_deform_attn_v10 import _group_taps_quad

    BLK = 128

    def _kernel(bases_ref, counts_ref, x_ref, y_ref, a_ref, v_ref,
                scale_ref, out_ref):
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
        outs_f = [jnp.zeros((qpg, D), jnp.float32) for _ in range(ng)]
        for lvl in range(L):
            h, w = shapes[lvl]
            idx_all, k00a, k01a, k10a, k11a = _group_taps_quad(
                x_ref[0, lvl], y_ref[0, lvl], a_ref[0, lvl], h, w
            )
            idx_all = idx_all + lvl_offs[lvl]
            count = counts_ref[tile * L + lvl]
            lo_all = idx_all & (BLK - 1)
            hi_all = idx_all >> 7

            def visit(graw, j, k, lo_all=lo_all, hi_all=hi_all, lvl=lvl):
                b0 = jnp.minimum(
                    bases_ref[(tile * L + lvl) * ng + j] + k * BLK, max_b0
                )
                b0 = pl.multiple_of(b0, BLK)
                if variant == "emptyloop":
                    return graw
                vbt = v_ref[0, :, pl.ds(b0, BLK)]
                inb = hi_all[j : j + 1] == (b0 >> 7)
                if variant == "nogather":
                    g = vbt
                else:
                    g = jnp.take_along_axis(
                        vbt, jnp.broadcast_to(lo_all[j : j + 1], (D2, BLK)),
                        axis=1,
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

            scale_a = scale_ref[0, lvl, :D2].reshape(1, D2)
            scale_b = scale_ref[0, lvl, D2:].reshape(1, D2)
            scale_f = scale_ref[0, lvl, :].reshape(1, D)
            for j in range(ng):
                g = graws[j]
                if variant == "nopost":
                    outs_a[j] = outs_a[j] + jnp.sum(
                        g.astype(jnp.float32), axis=1, keepdims=True
                    )[:qpg, :] * scale_a
                    continue
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
                if variant == "onematmul":
                    # one (qpg, BLK) x (BLK, D) matmul on the sublane-concat
                    # accumulators instead of two (qpg, BLK) x (BLK, D/2)
                    res = jax.lax.dot_general(
                        sel, jnp.concatenate([acc_a, acc_b], axis=0),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    outs_f[j] = outs_f[j] + res * scale_f
                    continue
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
            if variant == "onematmul":
                out_ref[0, j * qpg : (j + 1) * qpg, :] = outs_f[j].astype(
                    out_ref.dtype
                )
            else:
                out_ref[0, j * qpg : (j + 1) * qpg, :] = jnp.concatenate(
                    [outs_a[j], outs_b[j]], axis=1
                ).astype(out_ref.dtype)

    return _kernel


def run_variant(variant, staged, shapes, lvl_offs, TQ, UNROLL):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vp, scales, xg, yg, ag, bases, counts = staged
    BH, D2, S_pad = vp.shape
    D = 2 * D2
    L, n_groups, gp = xg.shape[1], xg.shape[2], xg.shape[3]
    nqt = counts.shape[1]
    ng = n_groups // nqt
    kern = make_kernel(variant, shapes, lvl_offs, nqt, S_pad, TQ, UNROLL)
    coord_spec = pl.BlockSpec(
        (1, L, ng, gp), lambda b, q, *_: (b, 0, q, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(BH, nqt),
        in_specs=[
            coord_spec, coord_spec, coord_spec,
            pl.BlockSpec((1, D2, S_pad), lambda b, q, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, q, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, q, *_: (b, q, 0),
                               memory_space=pltpu.VMEM),
    )

    def op(x_, vp_, s_, y_, a_, b_, c_):
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((BH, nqt * TQ, D), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(b_.reshape(-1), c_.reshape(-1), x_, y_, a_, vp_, s_)
        return jnp.sum(out.astype(jnp.float32))

    timed(op, (xg, vp, scales, yg, ag, bases, counts),
          name=f"v16:{variant} (TQ={TQ} UNROLL={UNROLL})")


def main():
    import jax
    import jax.numpy as jnp

    import pairnet_tpu.ops.pallas_deform_attn_v16 as v16
    from pairnet_tpu.models.layers import encoder_reference_points
    from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up

    B, H, D, P = int(os.environ.get("BENCH_BATCH", "4")), 8, 32, 4
    shapes = ((168, 100), (84, 50), (42, 25))
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Q = S
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    ref = encoder_reference_points(shapes)
    offs = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (B, Q, H, L, P, 2))
    norm = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    locs = (
        ref[None, :, None, :, None, :]
        + offs / norm[None, None, None, :, None, :]
    )
    aw = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (B, Q, H, L * P)), -1
    ).reshape(B, Q, H, L, P)

    TQ, UNROLL = v16.TQ, v16.UNROLL

    def stage(value, locs, weights):
        captured = {}
        orig = v16._weighted_gather_v16

        def spy(vp, scales, xg, yg, ag, bases, counts, shapes_, lvl_offs_):
            captured["t"] = (vp, scales, xg, yg, ag, bases, counts)
            return orig(vp, scales, xg, yg, ag, bases, counts, shapes_, lvl_offs_)

        v16._weighted_gather_v16 = spy
        try:
            v16._ms_deform_attn_v16_impl(value, shapes, locs, weights)
        finally:
            v16._weighted_gather_v16 = orig
        return captured["t"]

    staged = jax.jit(lambda v, l, w: stage(v, l, w))(value, locs, aw)
    lvl_offs, pos = [], 0
    for h, w in shapes:
        lvl_offs.append(pos)
        pos += _round_up(h * w + 128, 128)
    lvl_offs = tuple(lvl_offs)

    variants = os.environ.get(
        "PROBE_VARIANTS", "full,nogather,emptyloop,nopost,onematmul"
    ).split(",")
    for variant in variants:
        run_variant(variant, staged, shapes, lvl_offs, TQ, UNROLL)

    # prep-side: int4 pack vs int8 pack, standalone
    if os.environ.get("PROBE_PACK", "1") == "1":
        import pairnet_tpu.ops.pallas_deform_attn_v12 as v12

        BHn = B * H
        S_pad = staged[0].shape[2]
        vraw = jax.random.normal(
            jax.random.PRNGKey(7), (BHn, D, S_pad), jnp.bfloat16
        )
        scales_dl = (
            jnp.max(jnp.abs(vraw.astype(jnp.float32)), axis=2, keepdims=True)
            / 7.0
        )
        scales_dl = jnp.broadcast_to(scales_dl, (BHn, D, L)) + 1e-20
        s_pads = []
        for h, w in shapes:
            s_pads.append(_round_up(h * w + 128, 128))

        timed(
            lambda c, s: jnp.sum(
                v16._quantize_pack_int4(
                    c, s, shapes, lvl_offs, tuple(s_pads)
                ).astype(jnp.float32)
            ),
            (vraw, scales_dl),
            name="int4 pair-channel pack (prep)",
        )
        if True:
            timed(
                lambda c, s: jnp.sum(
                    v12._quantize_pack_fused(
                        c, s, shapes, lvl_offs, tuple(s_pads)
                    ).astype(jnp.float32)
                ),
                (vraw, scales_dl),
                name="int8 quad pack (v12 prep)",
            )


if __name__ == "__main__":
    main()
