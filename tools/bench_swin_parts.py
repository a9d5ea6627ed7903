#!/usr/bin/env python
"""Swin-B backbone part costs at bench geometry (VERDICT r4 #4).

The Swin-B e2e row has been flat at 16.8 img/s for two rounds with no
profile. This tool times, per stage geometry (default: the depth-18
stride-16 stage that dominates block count, and the stride-4 stage that
dominates token count), one SwinBlock and its pieces:

  * full block (unshifted / shifted)
  * window-attention core with f32 score materialization (current path)
  * the same with bf16 scores (halved HBM traffic around the softmax)
  * MLP with exact-erf gelu (current) vs tanh-approx gelu
  * window partition + reverse + roll relayouts alone

Chained-iteration + scalar-fetch methodology per bench.py (the tunneled
runtime memoizes identical executions; block_until_ready does not block).

Usage: python tools/bench_swin_parts.py [--batch 8] [--stages s16,s4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

# (H, W, C, heads, n_blocks) per stage at 800x1344 input (stride-4 map
# 200x336), BEFORE window padding — blocks pad internally like mmdet
STAGES = {
    "s4": (200, 336, 128, 4, 2),
    "s8": (100, 168, 256, 8, 2),
    "s16": (50, 84, 512, 16, 18),
    "s32": (25, 42, 1024, 32, 2),
}
WIN = 12


def timed(fn, args, iters=6, name=""):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        out = fn(*a)
        a0 = a[0] + (1e-3 * out.reshape(-1)[0].astype(jnp.float32)).astype(
            a[0].dtype
        )
        return (a0,) + tuple(a[1:]), out

    cfn = jax.jit(chained)
    a, out = cfn(*args)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    a = args
    t0 = time.perf_counter()
    for _ in range(iters):
        a, out = cfn(*a)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def attn_core(wins, qkv_w, score_dtype):
    """Window-attention einsum chain on pre-partitioned windows
    (nW*B, 144, C): qkv proj -> scores -> softmax -> out. No bias/mask
    (elementwise adds fuse into the softmax chain and don't change the
    traffic shape)."""
    import jax
    import jax.numpy as jnp

    C = wins.shape[-1]
    H = {128: 4, 256: 8, 512: 16, 1024: 32}[C]
    D = C // H
    qkv = wins @ qkv_w  # (nWB, 144, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(*t.shape[:-1], H, D).swapaxes(-3, -2)

    q, k, v = heads(q), heads(k), heads(v)
    s = jnp.einsum(
        "...hqd,...hkd->...hqk", q * (D**-0.5), k,
        preferred_element_type=score_dtype,
    )
    a = jax.nn.softmax(s.astype(jnp.float32), -1).astype(score_dtype)
    out = jnp.einsum("...hqk,...hkd->...hqd", a.astype(v.dtype), v)
    return out.swapaxes(-3, -2).reshape(*wins.shape[:-1], C)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--stages", default="s16,s4")
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.backbones.swin import (
        SwinBlock,
        _window_partition,
        _window_reverse,
    )

    def cast_bf16(tree):
        return jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
            tree,
        )

    for stage in args.stages.split(","):
        H, W, C, heads, n_blocks = STAGES[stage]
        B = args.batch
        print(
            f"\n== {stage}: ({B}, {H}, {W}, {C}) heads={heads} "
            f"x{n_blocks} blocks (bf16 params/input)",
            flush=True,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)

        full = {}
        for shift in (0, 6):
            blk = SwinBlock(C, heads, WIN, shift=shift)
            params = cast_bf16(blk.init(jax.random.PRNGKey(1), x))
            full[shift] = timed(
                lambda y, p, blk=blk: blk.apply(p, y),
                (x, params),
                iters=args.iters,
                name=f"full block shift={shift}",
            )
        est = (full[0] + full[6]) / 2 * n_blocks
        print(f"    -> stage estimate {est:.1f} ms")

        # pre-partitioned windows for the attention core
        Hp, Wp = -(-H // WIN) * WIN, -(-W // WIN) * WIN
        xp = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        wins = _window_partition(xp, WIN)
        qkv_w = jax.random.normal(
            jax.random.PRNGKey(2), (C, 3 * C), jnp.bfloat16
        ) * 0.02
        for sd, nm in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            timed(
                lambda w, p, sd=sd: attn_core(w, p, sd),
                (wins, qkv_w),
                iters=args.iters,
                name=f"attn core, {nm} scores",
            )

        # MLP: erf vs tanh gelu
        fc1 = jax.random.normal(
            jax.random.PRNGKey(3), (C, 4 * C), jnp.bfloat16
        ) * 0.02
        fc2 = jax.random.normal(
            jax.random.PRNGKey(4), (4 * C, C), jnp.bfloat16
        ) * 0.02
        for approx, nm in ((False, "erf"), (True, "tanh")):
            timed(
                lambda y, a, b, approx=approx: jax.nn.gelu(
                    y @ a, approximate=approx
                )
                @ b,
                (x, fc1, fc2),
                iters=args.iters,
                name=f"mlp, {nm} gelu",
            )

        # relayouts alone: pad -> roll -> partition -> reverse -> unroll
        def relayout(y):
            yp = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            yp = jnp.roll(yp, (-6, -6), axis=(1, 2))
            w = _window_partition(yp, WIN)
            yr = _window_reverse(w * 1.0001, WIN, B, Hp, Wp)
            yr = jnp.roll(yr, (6, 6), axis=(1, 2))
            return yr[:, :H, :W]

        timed(relayout, (x,), iters=args.iters, name="relayouts only")


if __name__ == "__main__":
    main()
