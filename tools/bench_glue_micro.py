#!/usr/bin/env python
"""Micro-bench the encoder glue pieces at bench geometry (bf16).

Times each projection/FFN/LN in isolation and a few fused combinations to
locate where the measured ~5.3 ms/layer of non-kernel encoder time goes
(roofline estimate is ~1.5 ms). Chained methodology per bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def timed(fn, args, touch, iters=16, name=""):
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
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    B = int(os.environ.get("BENCH_BATCH", "4"))
    S = 22050
    C = 256
    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, S, C), dtype)
    w1 = jax.random.normal(jax.random.PRNGKey(1), (C, C), dtype) * 0.05
    wffn1 = jax.random.normal(jax.random.PRNGKey(2), (C, 1024), dtype) * 0.05
    wffn2 = jax.random.normal(jax.random.PRNGKey(3), (1024, C), dtype) * 0.05
    woff = jax.random.normal(jax.random.PRNGKey(4), (C, 192), dtype) * 0.05
    wattn = jax.random.normal(jax.random.PRNGKey(5), (C, 96), dtype) * 0.05
    touch = lambda o: o.reshape(-1)[0].astype(jnp.float32)

    def ln(t):
        m = jnp.mean(t.astype(jnp.float32), -1, keepdims=True)
        v = jnp.var(t.astype(jnp.float32), -1, keepdims=True)
        return ((t - m) * jax.lax.rsqrt(v + 1e-5)).astype(t.dtype)

    timed(lambda t: t @ w1, (x,), touch, name="dense 256->256")
    timed(lambda t: t @ wffn1, (x,), touch, name="dense 256->1024")
    timed(
        lambda t: jax.nn.relu(t @ wffn1) @ wffn2, (x,), touch,
        name="FFN 256->1024->256",
    )
    timed(lambda t: ln(t), (x,), touch, name="layernorm")
    timed(lambda t: t @ woff, (x,), touch, name="offsets proj 256->192")
    timed(
        lambda t: jax.nn.softmax(
            (t @ wattn).reshape(B, S, 8, 12), -1
        ).astype(t.dtype),
        (x,), touch, name="attn proj + softmax",
    )
    timed(
        lambda t: ln(t + jax.nn.relu(ln(t @ w1) @ wffn1) @ wffn2),
        (x,), touch, name="proj+LN+FFN+LN fused chain",
    )
    # value proj producing the kernel's plane-major layout directly:
    # (B,S,C) @ (C,C) -> transpose to (C,B,S) vs transposed matmul
    timed(
        lambda t: (t @ w1).reshape(B, S, 8, 32).transpose(2, 3, 0, 1),
        (x,), touch, name="vproj + (B,S,H,D)->(H,D,B,S) relayout",
    )
    timed(
        lambda t: jnp.einsum("ck,bsk->cbs", w1, t, preferred_element_type=jnp.float32),
        (x,), touch, name="vproj direct to (C,B,S) via einsum",
    )
    timed(
        lambda t: jnp.einsum(
            "ck,bsk->cbs", w1, t, preferred_element_type=jnp.float32
        ).astype(t.dtype),
        (x,), touch, name="vproj direct to (C,B,S) einsum bf16 out",
    )


if __name__ == "__main__":
    main()
