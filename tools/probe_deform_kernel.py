#!/usr/bin/env python
"""Ablation probe of the deform-attn gather kernel's per-visit costs.

Variants of the v14 select-merge kernel with pieces removed, timed on
staged inputs (scan-amortized):

  full        slice + rel/inb + gather + select merge + post-loop extract
  nogather    gather replaced by the block's first 128 lanes (keeps slice,
              masks, select, extraction, matmuls)
  noslice     gather from a FIXED block (b0=0): keeps gather cost, kills
              the per-visit dynamic VMEM slice
  emptyloop   loop body = carry passthrough (pure loop/bookkeeping cost)
  nopost      full loop, but post-loop extraction+matmul replaced by a sum
  gcond       full + per-GROUP visit bounds: each group's UNROLL-pair is
              wrapped in lax.cond on its own prefetched block count
              (skips the 26-38% of visits the shared max forces)

The differences attribute kernel time to gather / slice / loop overhead /
post-loop work. Results are WRONG numerically (except full) — timing only.
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

            def visit(graw, j, k, idx_all=idx_all, lvl=lvl):
                b0 = jnp.minimum(
                    bases_ref[(tile * L + lvl) * ng + j] + k * BLK, max_b0
                )
                b0 = pl.multiple_of(b0, BLK)
                if variant == "emptyloop":
                    return graw
                if variant == "noslice":
                    vbt = v_ref[0, :, pl.ds(0, BLK)]
                else:
                    vbt = v_ref[0, :, pl.ds(b0, BLK)]
                rel = idx_all[j : j + 1] - b0
                inb = (rel >= 0) & (rel < BLK)
                lo = jnp.clip(rel, 0, BLK - 1)
                if variant == "nogather":
                    g = vbt
                else:
                    g = jnp.take_along_axis(
                        vbt, jnp.broadcast_to(lo, (D, BLK)), axis=1
                    )
                return jnp.where(inb, g, graw)

            if variant == "gcond":
                # per-group bounds: counts_ref here is PER-GROUP nblk laid
                # out [(tile*L + lvl)*ng + j]; the loop runs to the groups'
                # max, each group cond-skips past its own count
                def blk_body(k2, graws, lvl=lvl):
                    out = []
                    for j in range(ng):
                        nblk_j = counts_ref[(tile * L + lvl) * ng + j]

                        def do(gr, j=j, k2=k2):
                            for u in range(UNROLL):
                                gr = visit(gr, j, UNROLL * k2 + u)
                            return gr

                        out.append(
                            jax.lax.cond(
                                k2 * UNROLL < nblk_j, do, lambda gr: gr,
                                graws[j],
                            )
                        )
                    return tuple(out)

                count = counts_ref[(tile * L + lvl) * ng]
                for j in range(1, ng):
                    count = jnp.maximum(
                        count, counts_ref[(tile * L + lvl) * ng + j]
                    )
            else:
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

            scale_row = scale_ref[0, lvl, :].reshape(1, D)
            for j in range(ng):
                g = graws[j]
                if variant == "nopost":
                    outs[j] = outs[j] + jnp.sum(
                        g.astype(jnp.float32), axis=1, keepdims=True
                    )[:qpg, :] * scale_row
                    continue
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
            out_ref[0, j * qpg : (j + 1) * qpg, :] = outs[j].astype(
                out_ref.dtype
            )

    return _kernel


def run_variant(variant, staged, shapes, lvl_offs, TQ, UNROLL):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    vp, scales, xg, yg, ag, bases, counts = staged
    BH, D, S_pad = vp.shape
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
            pl.BlockSpec((1, D, S_pad), lambda b, q, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, q, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, D), lambda b, q, *_: (b, q, 0),
                               memory_space=pltpu.VMEM),
    )

    def op(x_, vp_, s_, y_, a_, b_, c_):
        import jax.numpy as jnp

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
          name=f"{variant} (TQ={TQ} UNROLL={UNROLL})")


def main():
    import jax
    import jax.numpy as jnp

    import pairnet_tpu.ops.pallas_deform_attn_v14 as v14
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

    # stage once with v14's own prep (graph shared across variants)
    TQ, UNROLL = v14.TQ, v14.UNROLL

    def stage(value, locs, weights):
        # returns the kernel inputs exactly as v14's impl builds them
        import pairnet_tpu.ops.pallas_deform_attn_v14 as m

        captured = {}
        orig = m._weighted_gather_v14

        def spy(vp, scales, xg, yg, ag, bases, counts, shapes_, lvl_offs_):
            captured["t"] = (vp, scales, xg, yg, ag, bases, counts)
            captured["lvl_offs"] = lvl_offs_
            return orig(vp, scales, xg, yg, ag, bases, counts, shapes_, lvl_offs_)

        m._weighted_gather_v14 = spy
        try:
            m._ms_deform_attn_v14_impl(value, shapes, locs, weights)
        finally:
            m._weighted_gather_v14 = orig
        return captured["t"], captured["lvl_offs"]

    staged, lvl_offs = jax.jit(
        lambda v, l, w: stage(v, l, w)[0]
    )(value, locs, aw), None
    lvl_offs, pos = [], 0
    for h, w in shapes:
        lvl_offs.append(pos)
        pos += _round_up(h * w + 128, 128)
    lvl_offs = tuple(lvl_offs)

    # per-group block counts for the gcond variant (recomputed from the
    # staged grouped coords exactly like the prep's pre-max nblk)
    vp, scales, xg, yg, ag, bases, counts = staged
    BH = vp.shape[0]
    nqt = counts.shape[1]
    ng = xg.shape[2] // nqt
    counts_pg = []
    for lvl, (h, w) in enumerate(shapes):
        y0 = jnp.floor(yg[:, lvl]).astype(jnp.int32)
        x0 = jnp.floor(xg[:, lvl]).astype(jnp.int32)
        flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        hi = jnp.max(flat, axis=-1).reshape(BH, nqt, 1, ng) + lvl_offs[lvl]
        counts_pg.append((hi - bases[:, :, lvl : lvl + 1]) // 128 + 1)
    counts_pg = jnp.concatenate(counts_pg, axis=2)  # (BH, nqt, L, ng)
    staged_pg = (vp, scales, xg, yg, ag, bases, counts_pg)

    variants = os.environ.get(
        "PROBE_VARIANTS", "full,nogather,noslice,emptyloop,nopost,gcond"
    ).split(",")
    for variant in variants:
        run_variant(
            variant,
            staged_pg if variant == "gcond" else staged,
            shapes, lvl_offs, TQ, UNROLL,
        )


if __name__ == "__main__":
    main()
