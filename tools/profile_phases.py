#!/usr/bin/env python
"""Per-phase TPU profile of the Pair-Net R-50 forward at bench geometry.

Times cumulative prefixes (backbone / +pixel-decoder / +decoder / full) with
the chained-iteration + scalar-fetch methodology from bench.py (the tunneled
axon runtime memoizes repeated identical executions and block_until_ready
does not block). Differences between prefixes give per-phase cost.

Usage: python tools/profile_phases.py [--batch 4] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--model", default="r50", choices=["r50", "swinb"])
    ap.add_argument("--iters", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship(backbone=args.model)
    head = model.bbox_head
    B, H, W = args.batch, 800, 1344
    img = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    dtype = dict(bf16=jnp.bfloat16, f32=jnp.float32)[args.dtype]
    if dtype != jnp.float32:
        cast = lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t
        variables = jax.tree_util.tree_map(cast, variables)
        img = img.astype(dtype)

    def backbone_only(v, x):
        feats = model.apply(v, x, method=lambda m, i: m.backbone(i))
        return feats[-1]  # C5

    def thru_pixel_decoder(v, x):
        def run(m, i):
            feats = m.backbone(i)
            mask_features, ms = m.bbox_head.pixel_decoder(feats)
            return mask_features, ms

        mask_features, ms = model.apply(v, x, method=run)
        return mask_features

    def thru_decoder(v, x):
        def run(m, i):
            from pairnet_tpu.models.layers import sine_positional_encoding

            feats = m.backbone(i)
            hd = m.bbox_head
            mask_features, ms = hd.pixel_decoder(feats)
            pos = [
                sine_positional_encoding(f.shape[1], f.shape[2], hd.embed_dims // 2)
                for f in ms
            ]
            dec = hd.transformer_decoder(ms, mask_features, pos)
            return dec["queries"]

        return model.apply(v, x, method=run)

    def full(v, x):
        return model.apply(v, x)["rel"]

    phases = [
        ("backbone", backbone_only),
        ("+pixel_decoder", thru_pixel_decoder),
        ("+transformer_decoder", thru_decoder),
        ("full", full),
    ]

    results = {}
    for name, fn in phases:
        def chained(v, x, fn=fn):
            out = fn(v, x)
            x = jnp.roll(x, 1, axis=2) + (
                0.01 * out.reshape(-1)[0].astype(jnp.float32)
            ).astype(x.dtype)
            return x, out

        cfn = jax.jit(chained)
        x, out = cfn(variables, img)
        _ = float(out.reshape(-1)[0].astype(jnp.float32))  # warm
        x = img
        t0 = time.perf_counter()
        for _ in range(args.iters):
            x, out = cfn(variables, x)
        _ = float(out.reshape(-1)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt * 1000
        print(f"{name:24s} cumulative {dt*1000:8.1f} ms")

    print()
    keys = [k for k, _ in phases]
    prev = 0.0
    for k in keys:
        print(f"{k:24s} phase {results[k]-prev:8.1f} ms")
        prev = results[k]
    total = results["full"]
    print(f"\ntotal {total:.1f} ms  ->  {args.batch / (total/1000):.2f} img/s")


if __name__ == "__main__":
    main()
