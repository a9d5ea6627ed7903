#!/usr/bin/env python
"""Full-geometry kernel-precision A/B: output-logit deltas at 800x1344.

VERDICT r2 weak #2: the tiny-checkpoint A/B (tools/ab_kernel_precision.py)
bounds nothing about the production geometry. This runs the FULL flagship
model (256 dims, 6-layer pixel decoder) at the bench resolution and
reports max |delta| of the cls / mask / rel / importance logits for each
Pallas implementation against the exact-f32 XLA 'patch' formulation, in
both f32 and bf16 (bf16 additionally bounds the dtype cast itself).

No reference checkpoints exist in this environment (zero egress), so
weights are init-scale; offsets at init span the mmcv bias grid (+-4 px),
the same regime the headline bench runs in.

Usage: python tools/ab_kernel_fullgeom.py [--impls patch,pallas_v6,...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impls", default="patch,pallas_v6,pallas_v7,pallas_v12,pallas_v14")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    model = _flagship()
    B, H, W = args.batch, 800, 1344
    img = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    if dtype != jnp.float32:
        cast = lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t
        variables = jax.tree_util.tree_map(cast, variables)
        img = img.astype(dtype)

    keys = ("cls", "rel", "importance", "mask")
    outs = {}
    for impl in args.impls.split(","):
        os.environ["PAIRNET_DEFORM_IMPL"] = impl
        fwd = jax.jit(lambda v, x: model.apply(v, x))
        o = fwd(variables, img)
        outs[impl] = {
            k: jax.device_get(o[k]).astype("float32") for k in keys
        }
        print(f"{impl}: done", flush=True)

    import numpy as np

    base = args.impls.split(",")[0]
    report = {"dtype": args.dtype, "baseline": base, "geometry": f"{H}x{W}"}
    for impl in args.impls.split(",")[1:]:
        for k in keys:
            d = float(np.abs(outs[impl][k] - outs[base][k]).max())
            ref = float(np.abs(outs[base][k]).max())
            report[f"{impl}.max_abs_delta.{k}"] = d
            report[f"{impl}.rel_delta.{k}"] = d / max(ref, 1e-9)
            print(f"{impl} vs {base}  {k:10s} max|d|={d:.3e}  rel={d/max(ref,1e-9):.3e}",
                  flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
