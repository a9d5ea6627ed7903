#!/usr/bin/env python
"""Scan-amortized ResNet-50 backbone stage ablation at bench geometry (bf16).

Times cumulative prefixes (stem / +layer1 / ... / +layer4) of the NHWC
frozen-BN backbone to locate where its measured ~13-16 ms (batch 4) goes —
the f32-compute + HBM roofline is ~5 ms. Methodology per
tools/bench_glue_micro.py (REPS inside one jit, full-sum consumption).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

REPS = int(os.environ.get("BENCH_REPS", "8"))


def timed(op, x, ws, iters=4, name=""):
    import jax
    import jax.numpy as jnp

    def chained(x, ws):
        def body(c, _):
            y = op(c, ws)
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
    dt = time.perf_counter() - t0
    ms = dt / (iters * REPS) * 1000
    print(f"{name:36s} {ms:8.3f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.backbones.resnet import ResNet

    B, H, W = int(os.environ.get("BENCH_BATCH", "4")), 800, 1344
    del ResNet  # prefixes are built below
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 3), jnp.bfloat16)

    import flax.linen as fnn

    from pairnet_tpu.models.backbones.resnet import (
        _STAGE_BLOCKS,
        Bottleneck,
        StemConv,
    )
    from pairnet_tpu.models.layers import FrozenBatchNorm

    blocks = _STAGE_BLOCKS[50]

    def prefix(n_stages):
        class _Prefix(fnn.Module):
            @fnn.compact
            def __call__(self, xx):
                y = StemConv(64, name="conv1")(xx)
                y = fnn.relu(FrozenBatchNorm(64, name="bn1")(y))
                y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                            constant_values=-jnp.inf)
                y = fnn.max_pool(y, (3, 3), strides=(2, 2))
                planes = 64
                for stage in range(n_stages):
                    stride = 1 if stage == 0 else 2
                    for b in range(blocks[stage]):
                        y = Bottleneck(
                            planes, stride=stride if b == 0 else 1,
                            downsample=(b == 0),
                            name=f"layer{stage + 1}_{b}",
                        )(y)
                    planes *= 2
                return y

        return _Prefix()

    for n in range(5):
        m = prefix(n)
        v = jax.jit(m.init)(
            jax.random.PRNGKey(1), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        v = jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
            v,
        )
        name = "stem" if n == 0 else f"stem + layer1..{n}"
        timed(lambda c, vv, m=m: m.apply(vv, c), x, v, name=name)


if __name__ == "__main__":
    main()
