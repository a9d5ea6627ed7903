#!/usr/bin/env python
"""A/B deform-attn kernel implementations at encoder geometry (bf16).

Times the full 3-level op for each impl in BENCH_IMPLS (default v7,v8) at
tight (~2 px) and wide (~6 px) offset scales. Chained-iteration methodology
per bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def timed(fn, args, touch, iters=8, name=""):
    import jax

    def chained(*a):
        out = fn(*a)
        a0 = a[0] + (0.001 * touch(out)).astype(a[0].dtype)
        return (a0,) + tuple(a[1:]), out

    cfn = jax.jit(chained)
    a, out = cfn(*args)
    _ = float(touch(out))
    a = args
    t0 = time.perf_counter()
    for _i in range(iters):
        a, out = cfn(*a)
    _ = float(touch(out))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.layers import encoder_reference_points
    from pairnet_tpu.ops.deform_attn import ms_deform_attn

    B = int(os.environ.get("BENCH_BATCH", "4"))
    shapes = ((168, 100), (84, 50), (42, 25))
    S = sum(h * w for h, w in shapes)
    H, D, P = 8, 32, 4

    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, D), jnp.bfloat16)
    ref = encoder_reference_points(shapes)
    ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (B, S, H, 3 * P)), axis=-1
    ).reshape(B, S, H, 3, P)

    impls = os.environ.get("BENCH_IMPLS", "pallas_v7,pallas_v12").split(",")
    for scale, tag in ((2.0, "tight ~2px"), (6.0, "wide ~6px")):
        offs = (
            jax.random.normal(jax.random.PRNGKey(4), (B, S, H, 3, P, 2)) * scale
        ) / normalizer[None, None, None, :, None, :]
        locs = ref[:, :, None, :, None, :] + offs
        for impl in impls:
            timed(
                lambda vv, loc=locs, im=impl: ms_deform_attn(
                    vv, shapes, loc, attn, impl=im
                ),
                (v,),
                lambda o: o.reshape(-1)[0].astype(jnp.float32),
                name=f"{impl} ({tag})",
            )


if __name__ == "__main__":
    main()
