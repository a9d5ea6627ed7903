#!/usr/bin/env python
"""Fine-grained encoder-layer ablation at bench geometry (bf16).

Splits one DeformableEncoderLayer into: projections/FFN/LN (stub kernel,
coords DCE'd), + coords pipeline (stub kernel that consumes locs/weights),
+ the real Pallas kernel.  Chained-iteration methodology per bench.py.
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
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.layers import encoder_reference_points
    from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer
    from pairnet_tpu.ops.deform_attn import register_pallas_impl

    B = int(os.environ.get("BENCH_BATCH", "4"))
    shapes = ((168, 100), (84, 50), (42, 25))
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
    touch = lambda o: o.reshape(-1)[0].astype(jnp.float32)
    run = lambda t: layer.apply(variables, t, pos, ref, shapes)

    def stub_dce(value, spatial_shapes, locs, weights):
        # ignores locs/weights entirely -> XLA DCEs the coord pipeline
        B_, S_, H_, D_ = value.shape
        m = jnp.mean(value.astype(jnp.float32), axis=1, keepdims=True)
        return jnp.broadcast_to(m, (B_, locs.shape[1], H_, D_)).reshape(
            B_, locs.shape[1], H_ * D_
        )

    def stub_coords(value, spatial_shapes, locs, weights):
        # consumes locs/weights with a cheap reduction, keeping the full
        # offsets/softmax/locs pipeline alive (approximates glue-without-
        # the-gather; the kernel's own XLA-side coord prep is NOT included)
        B_, S_, H_, D_ = value.shape
        m = jnp.mean(value.astype(jnp.float32), axis=1, keepdims=True)
        lw = (
            jnp.sum(locs.astype(jnp.float32), axis=(3, 4, 5))
            + jnp.sum(weights.astype(jnp.float32), axis=(3, 4))
        )  # (B, Q, H)
        out = m * (1.0 + 1e-6 * lw[..., None])
        return out.reshape(B_, locs.shape[1], H_ * D_)

    register_pallas_impl("stub_dce", stub_dce)
    register_pallas_impl("stub_coords", stub_coords)

    for impl, name in (
        (None, "1 layer, real kernel (auto v7)"),
        ("pallas_v12", "1 layer, real kernel (v12 int8 fused)"),
        ("stub_dce", "1 layer, stub kernel, coords DCE'd"),
        ("stub_coords", "1 layer, stub kernel, coords computed"),
    ):
        if impl is None:
            os.environ.pop("PAIRNET_DEFORM_IMPL", None)
        else:
            os.environ["PAIRNET_DEFORM_IMPL"] = impl
        try:
            timed(run, (tokens,), touch, name=name)
        finally:
            os.environ.pop("PAIRNET_DEFORM_IMPL", None)


if __name__ == "__main__":
    main()
