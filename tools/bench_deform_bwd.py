#!/usr/bin/env python
"""Backward-pass cost of the deform-attn op and one encoder layer (f32).

Times grad(sum(op)) wrt value/locs/weights per impl at encoder geometry,
plus grad of a full DeformableEncoderLayer, isolating the v6 backward
kernel's share of the ~1s train-step backward.  Chained methodology per
bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def timed(fn, args, iters=4, name=""):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        out = fn(*a)
        a0 = a[0] + (1e-9 * out).astype(a[0].dtype)
        return (a0,) + tuple(a[1:]), out

    cfn = jax.jit(chained)
    a, out = cfn(*args)
    _ = float(out)
    a = args
    t0 = time.perf_counter()
    for _i in range(iters):
        a, out = cfn(*a)
    _ = float(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.models.layers import encoder_reference_points
    from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer
    from pairnet_tpu.ops.deform_attn import ms_deform_attn

    B = int(os.environ.get("BENCH_BATCH", "4"))
    shapes = ((168, 100), (84, 50), (42, 25))
    S = sum(h * w for h, w in shapes)
    C, H, P = 256, 8, 4
    D = C // H

    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, D), jnp.float32)
    ref = encoder_reference_points(shapes)
    ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    offs = (
        jax.random.normal(jax.random.PRNGKey(4), (B, S, H, 3, P, 2)) * 2.0
    ) / normalizer[None, None, None, :, None, :]
    locs = ref[:, :, None, :, None, :] + offs
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (B, S, H, 3 * P)), axis=-1
    ).reshape(B, S, H, 3, P)

    impls = os.environ.get("BENCH_IMPLS", "pallas_v6").split(",")
    for impl in impls:
        os.environ["PAIRNET_DEFORM_IMPL"] = impl

        def fwd_sum(vv, ll, aa):
            return jnp.sum(ms_deform_attn(vv, shapes, ll, aa))

        timed(
            lambda vv: fwd_sum(vv, locs, attn), (v,),
            name=f"[{impl}] op fwd (sum)",
        )
        g = jax.grad(fwd_sum, argnums=(0, 1, 2))
        timed(
            lambda vv: sum(jnp.sum(t) for t in g(vv, locs, attn)), (v,),
            name=f"[{impl}] op grad(value,locs,weights)",
        )
    os.environ.pop("PAIRNET_DEFORM_IMPL", None)

    # full encoder layer fwd vs grad (params + tokens), f32 like training
    tokens = jax.random.normal(jax.random.PRNGKey(0), (B, S, C), jnp.float32)
    pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), jnp.float32)
    layer = DeformableEncoderLayer(C, 8, 3, 4, 1024, swap_offset_xy=True)
    variables = layer.init(jax.random.PRNGKey(2), tokens, pos, ref, shapes)

    def layer_sum(t):
        return jnp.sum(layer.apply(variables, t, pos, ref, shapes))

    timed(lambda t: layer_sum(t), (tokens,), name="1 layer fwd (f32)")
    gl = jax.grad(layer_sum)
    timed(
        lambda t: jnp.sum(gl(t)), (tokens,), name="1 layer grad(tokens) (f32)"
    )


if __name__ == "__main__":
    main()
