#!/usr/bin/env python
"""Production-geometry encoder-layer timing: kernel vs XLA glue.

Times, at the bench geometry (800x1344, B=4, bf16, levels (100,168)/(50,84)/
(25,42)):
  1. one full DeformableEncoderLayer (attn + FFN + 2 LN),
  2. the ms_deform_attn op alone (auto-dispatch: v7 for bf16),
  3. the layer with the deform-attn core replaced by a mean over taps
     (same projections/FFN/LN work, no gather kernel) -> glue cost,
  4. six chained layers (the full encoder stack).
Chained-iteration methodology per bench.py. PAIRNET_DEFORM_IMPL honored.
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
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.layers import (
        encoder_reference_points,
    )
    from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer

    B = int(os.environ.get("BENCH_BATCH", "4"))
    shapes = ((168, 100), (84, 50), (42, 25))  # transposed (landscape) planes
    S = sum(h * w for h, w in shapes)
    C = 256
    dtype = jnp.bfloat16

    key = jax.random.PRNGKey(0)
    tokens = jax.random.normal(key, (B, S, C), dtype)
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), dtype)
    ref = encoder_reference_points(shapes)
    ref = jnp.broadcast_to(ref[None], (B, *ref.shape))

    layer = DeformableEncoderLayer(C, 8, 3, 4, 1024, swap_offset_xy=True)
    variables = layer.init(jax.random.PRNGKey(2), tokens, pos, ref, shapes)
    variables = jax.tree_util.tree_map(
        lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, variables
    )

    timed(
        lambda t: layer.apply(variables, t, pos, ref, shapes),
        (tokens,),
        lambda o: o.reshape(-1)[0].astype(jnp.float32),
        name="1 encoder layer (attn+FFN+LN)",
    )

    # deform-attn op alone with pre-made inputs
    from pairnet_tpu.ops.deform_attn import ms_deform_attn

    H, P = 8, 4
    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, C // H), dtype)
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    offs = (
        jax.random.normal(jax.random.PRNGKey(4), (B, S, H, 3, P, 2)) * 2.0
    ) / normalizer[None, None, None, :, None, :]
    locs = ref[:, :, None, :, None, :] + offs
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (B, S, H, 3 * P)), axis=-1
    ).reshape(B, S, H, 3, P)

    timed(
        lambda vv: ms_deform_attn(vv, shapes, locs, attn),
        (v,),
        lambda o: o.reshape(-1)[0].astype(jnp.float32),
        name="ms_deform_attn op alone (auto impl)",
    )

    # glue-only: same layer but with a no-kernel attention core
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    def fake_impl(value, spatial_shapes, locs, weights):
        # same input/output contract, no gather: mean over value tokens
        B_, S_, H_, D_ = value.shape
        m = jnp.mean(value.astype(jnp.float32), axis=1, keepdims=True)
        return jnp.broadcast_to(m, (B_, locs.shape[1], H_, D_)).reshape(
            B_, locs.shape[1], H_ * D_
        )

    register_pallas_impl("stub", fake_impl)
    os.environ["PAIRNET_DEFORM_IMPL"] = "stub"
    try:
        timed(
            lambda t: layer.apply(variables, t, pos, ref, shapes),
            (tokens,),
            lambda o: o.reshape(-1)[0].astype(jnp.float32),
            name="1 encoder layer, kernel stubbed (glue)",
        )
    finally:
        del os.environ["PAIRNET_DEFORM_IMPL"]

    def six(t):
        for _ in range(6):
            t = layer.apply(variables, t, pos, ref, shapes)
        return t

    timed(
        six,
        (tokens,),
        lambda o: o.reshape(-1)[0].astype(jnp.float32),
        name="6 encoder layers",
    )


if __name__ == "__main__":
    main()
