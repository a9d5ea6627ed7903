#!/usr/bin/env python
"""Isolate kernel vs XLA-glue time in ms_deform_attn at encoder geometry.

Times, for level 0 (the largest), the raw pallas_call with pre-staged
inputs, then the XLA prep alone (kernel replaced by a trivial consumer),
then the full 3-level op. Chained-iteration methodology per bench.py.
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
    import jax.numpy as jnp

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
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import pairnet_tpu.ops.pallas_deform_attn_v6 as v6
    from pairnet_tpu.models.layers import encoder_reference_points

    B, H, D, P = 4, 8, 32, 4
    shapes = ((100, 168), (50, 84), (25, 42))
    S = sum(h * w for h, w in shapes)
    Q = S
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    value = jax.random.normal(k1, (B, S, H, D), jnp.float32)
    ref = encoder_reference_points(shapes)
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    offsets = (jax.random.normal(k2, (B, Q, H, 3, P, 2)) * 2.0) / normalizer[
        None, None, None, :, None, :
    ]
    locs = ref[None, :, None] .reshape(1, Q, 1, 3, 1, 2) + offsets
    attn = jax.nn.softmax(
        jax.random.normal(k3, (B, Q, H, 3 * P)), axis=-1
    ).reshape(B, Q, H, 3, P)

    # ---- pre-staged level-0 inputs for the raw pallas_call ----
    h, w = shapes[0]
    S_l = h * w
    BLK = v6.BLK
    TQ = v6.TQ
    S_pad = v6._round_up(S_l + BLK, BLK)
    Qp = v6._round_up(Q, TQ)
    qpg = BLK // (4 * P)
    rng = np.random.default_rng(0)
    vt = jnp.asarray(rng.normal(size=(B * H, D, S_pad)), jnp.float32)
    xg = jnp.asarray(
        rng.uniform(0, w - 1, size=(B * H, Qp // qpg, qpg * P)), jnp.float32
    )
    # spatially local: cluster taps like encoder queries (row-major walk)
    qpos = np.arange(Qp) % S_l
    ybase = (qpos // w).astype(np.float32)
    xbase = (qpos % w).astype(np.float32)
    xg = jnp.asarray(
        np.clip(
            xbase.reshape(1, -1, 1)
            + rng.normal(scale=2.0, size=(B * H, Qp, P)),
            0, w - 1,
        ).reshape(B * H, Qp // qpg, qpg * P),
        jnp.float32,
    )
    yg = jnp.asarray(
        np.clip(
            ybase.reshape(1, -1, 1)
            + rng.normal(scale=2.0, size=(B * H, Qp, P)),
            0, h - 1,
        ).reshape(B * H, Qp // qpg, qpg * P),
        jnp.float32,
    )
    ag = jnp.asarray(
        rng.uniform(size=(B * H, Qp // qpg, qpg * P)), jnp.float32
    )
    nqt = Qp // TQ
    ng = TQ // qpg
    y0 = np.floor(np.asarray(yg).reshape(B * H, nqt, ng, -1))
    x0 = np.floor(np.asarray(xg).reshape(B * H, nqt, ng, -1))
    flat = np.clip(y0, 0, h - 1) * w + np.clip(x0, 0, w - 1)
    lo = flat.min(-1).astype(np.int32)
    hi = (flat + w + 1).max(-1).astype(np.int32)
    base = jnp.asarray(np.maximum(lo, 0) // BLK * BLK, jnp.int32)
    nblk = jnp.asarray((hi - np.asarray(base)) // BLK + 1, jnp.int32)
    print("mean nblk:", float(jnp.mean(nblk.astype(jnp.float32))))

    timed(
        lambda v, x_, y_, a_: v6._weighted_gather_v6(
            v, x_, y_, a_, base, nblk, h, w
        ),
        (vt, xg, yg, ag),
        lambda o: o.reshape(-1)[0],
        name="raw pallas_call level0 (all 22k queries)",
    )

    timed(
        lambda v, l, wts: v6._ms_deform_attn_v6_impl(v, shapes, l, wts),
        (value, locs, attn),
        lambda o: o.reshape(-1)[0],
        name="full v6 op (3 levels + glue)",
    )


if __name__ == "__main__":
    main()
