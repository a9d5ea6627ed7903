#!/usr/bin/env python
"""Micro-bench the encoder glue pieces at bench geometry (bf16).

Times each projection/FFN/LN in isolation to locate where the measured
~5.3 ms/layer of non-kernel encoder time goes (roofline estimate ~1.5 ms).

Methodology: the tunneled runtime has ~3 ms per-dispatch overhead, which
swamps sub-ms ops under bench.py's per-call chaining. Here each op repeats
REPS times INSIDE one jit (output feeds the next input through a content-
changing epsilon), so the per-dispatch cost amortizes to noise. Weights are
jit ARGUMENTS (constants baked into HLO bloat XLA:TPU compile time;
see tools/test.py).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

REPS = int(os.environ.get("BENCH_REPS", "16"))


def timed(op, x, ws, iters=4, name=""):
    """op: (x, ws) -> y; y's first element feeds back into x."""
    import jax
    import jax.numpy as jnp

    def chained(x, ws):
        def body(c, _):
            y = op(c, ws)
            # FULL reduction: consuming a single element would let XLA
            # slice the op down to one output row (dots are sliceable)
            eps = (1e-12 * jnp.sum(y.astype(jnp.float32))).astype(c.dtype)
            return c + eps, None

        c, _ = jax.lax.scan(body, x, None, length=REPS)
        return c

    cfn = jax.jit(chained)
    out = cfn(x, ws)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _i in range(iters):
        out = cfn(out, ws)
    _ = float(out.reshape(-1)[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / (iters * REPS) * 1000
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
    ws = {
        "w1": jax.random.normal(jax.random.PRNGKey(1), (C, C), dtype) * 0.05,
        "ffn1": jax.random.normal(jax.random.PRNGKey(2), (C, 1024), dtype) * 0.05,
        "ffn2": jax.random.normal(jax.random.PRNGKey(3), (1024, C), dtype) * 0.05,
        "off": jax.random.normal(jax.random.PRNGKey(4), (C, 192), dtype) * 0.05,
        "attn": jax.random.normal(jax.random.PRNGKey(5), (C, 96), dtype) * 0.05,
    }

    def ln(t):
        m = jnp.mean(t.astype(jnp.float32), -1, keepdims=True)
        v = jnp.var(t.astype(jnp.float32), -1, keepdims=True)
        return ((t - m) * jax.lax.rsqrt(v + 1e-5)).astype(t.dtype)

    timed(lambda t, w: t, x, ws, name="empty chain (per-rep overhead)")
    timed(lambda t, w: t @ w["w1"], x, ws, name="dense 256->256")
    timed(
        lambda t, w: jax.nn.relu(t @ w["ffn1"]) @ w["ffn2"], x, ws,
        name="FFN 256->1024->256",
    )
    timed(lambda t, w: ln(t), x, ws, name="layernorm")
    timed(lambda t, w: t @ w["off"], x, ws, name="offsets proj 256->192")
    timed(
        lambda t, w: jax.nn.softmax(
            (t @ w["attn"]).reshape(B, S, 8, 12).astype(jnp.float32), -1
        ).astype(t.dtype),
        x, ws, name="attn proj + softmax",
    )
    timed(
        lambda t, w: ln(t + jax.nn.relu(ln(t @ w["w1"]) @ w["ffn1"]) @ w["ffn2"]),
        x, ws, name="proj+LN+FFN+LN chain",
    )
    timed(
        lambda t, w: (t @ w["w1"]).reshape(B, S, 8, 32).transpose(2, 3, 0, 1)
        * jnp.bfloat16(1.0),
        x, ws, name="vproj + (B,S,H,D)->(H,D,B,S) relayout",
    )
    timed(
        lambda t, w: jnp.einsum(
            "ck,bsk->cbs", w["w1"], t, preferred_element_type=jnp.float32
        ).astype(t.dtype),
        x, ws, name="vproj direct to (C,B,S) einsum bf16 out",
    )


if __name__ == "__main__":
    main()
