#!/usr/bin/env python
"""Isolated timing: XLA quantize+pack vs the fused Pallas _qp_kernel.

Both paths start from the same relayouted (BH, D, S) bf16 plane and produce
the packed int32 quad plane (+ scales) that feeds the v12 gather kernel.
Chained-iteration methodology per bench.py.
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

    import pairnet_tpu.ops.pallas_deform_attn_v12 as v12
    from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up
    from pairnet_tpu.ops.pallas_deform_attn_v10 import (
        _pack_quads,
        _quantize_rows,
    )

    B, H, D = int(os.environ.get("BENCH_BATCH", "4")), 8, 32
    shapes = ((168, 100), (84, 50), (42, 25))
    S = sum(h * w for h, w in shapes)
    BLK = v12.BLK
    vT = jax.random.normal(jax.random.PRNGKey(0), (B * H, D, S), jnp.bfloat16)
    touch = lambda o: o.reshape(-1)[0].astype(jnp.float32)

    offs = [0]
    for h, w in shapes:
        offs.append(offs[-1] + h * w)

    def xla_path(vT):
        planes = []
        for lvl, (h, w) in enumerate(shapes):
            S_l = h * w
            S_pad_l = _round_up(S_l + BLK, BLK)
            vl = jax.lax.dynamic_slice_in_dim(vT, offs[lvl], S_l, axis=2)
            q8, scale = _quantize_rows(vl)
            planes.append(
                jnp.pad(_pack_quads(q8, w), ((0, 0), (0, 0), (0, S_pad_l - S_l)))
            )
        return jnp.concatenate(planes, axis=2)

    def fused_path(vT):
        planes_raw, scales_l, lvl_offs, s_pads = [], [], [], []
        pos = 0
        for lvl, (h, w) in enumerate(shapes):
            S_l = h * w
            S_pad_l = _round_up(S_l + BLK, BLK)
            vl = jax.lax.dynamic_slice_in_dim(vT, offs[lvl], S_l, axis=2)
            scale = jnp.maximum(
                jnp.max(jnp.abs(vl.astype(jnp.float32)), axis=2, keepdims=True)
                / 127.0,
                1e-20,
            )
            planes_raw.append(jnp.pad(vl, ((0, 0), (0, 0), (0, S_pad_l - S_l))))
            scales_l.append(scale)
            lvl_offs.append(pos)
            s_pads.append(S_pad_l)
            pos += S_pad_l
        vraw = jnp.concatenate(planes_raw, axis=2)
        scales_dl = jnp.concatenate(scales_l, axis=2)
        return v12._quantize_pack_fused(
            vraw, scales_dl, shapes, tuple(lvl_offs), tuple(s_pads)
        )

    timed(xla_path, (vT,), touch, name="XLA quantize+pack (v10 path)")
    timed(fused_path, (vT,), touch, name="fused Pallas _qp_kernel path")


if __name__ == "__main__":
    main()
