#!/usr/bin/env python
"""Microbenchmark: ms_deform_attn at encoder geometry (B4, 800x1344).

Times one deform-attn core call (the hot op: 6 encoder layers x this) with
the chained-iteration methodology. Compares implementations via
PAIRNET_DEFORM_IMPL or --impl.
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
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--offset-scale", type=float, default=2.0,
                    help="sampling offset spread in cells (trained nets: ~1-8)")
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pairnet_tpu.ops.deform_attn import ms_deform_attn
    from pairnet_tpu.models.layers import encoder_reference_points

    B, H, D, P = args.batch, 8, 32, 4
    shapes = ((100, 168), (50, 84), (25, 42))
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    Q = S
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    dt = dict(f32=jnp.float32, bf16=jnp.bfloat16)[args.dtype]
    value = jax.random.normal(k1, (B, S, H, D), dt)
    ref = encoder_reference_points(shapes)  # (S, L, 2)
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    offsets = (
        jax.random.normal(k2, (B, Q, H, L, P, 2)) * args.offset_scale
    ) / normalizer[None, None, None, :, None, :]
    locs = (ref[None, :, None, :, None, :] + offsets).astype(dt)
    attn = jax.nn.softmax(
        jax.random.normal(k3, (B, Q, H, L * P)), axis=-1
    ).reshape(B, Q, H, L, P).astype(dt)

    fn = lambda v, l, w: ms_deform_attn(v, shapes, l, w, impl=args.impl)

    def chained(v, l, w):
        out = fn(v, l, w)
        v = v + (0.001 * out.reshape(-1)[0]).astype(v.dtype)
        return v, out

    cfn = jax.jit(chained)
    v, out = cfn(value, locs, attn)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    v = value
    t0 = time.perf_counter()
    for _ in range(args.iters):
        v, out = cfn(v, locs, attn)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    dt_ms = (time.perf_counter() - t0) / args.iters * 1000
    print(f"impl={args.impl} dtype={args.dtype} off={args.offset_scale}: "
          f"{dt_ms:.1f} ms/call  (x18 layer-levels -> {dt_ms*6:.0f} ms per fwd)")


if __name__ == "__main__":
    main()
