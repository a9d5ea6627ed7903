#!/usr/bin/env python
"""Kernel-precision A/B: R@K deltas across deform-attn implementations.

Bounds the metric impact of the Pallas kernels' numerics (v6 exact-f32
block gather, v7 bf16 packed-pair gather) against the exact XLA 'patch'
formulation, on a trained checkpoint evaluated end-to-end.

Usage:
    python tools/ab_kernel_precision.py CONFIG WORK_DIR [--split train]

Measured 2026-08-17 on a 964-step overfit tiny_synthetic checkpoint
(TPU v5e): max |R@K delta| = 0.0 across patch / pallas_v6 / pallas_v7
(R@20/50/100 = 0.90, mR = 0.8778 identically).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

IMPLS = tuple(
    os.environ.get(
        "AB_IMPLS", "patch,pallas_v6,pallas_v7,pallas_v12,pallas_v14,pallas_v16"
    ).split(",")
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("work_dir")
    ap.add_argument("--split", default="train", choices=["train", "test"])
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from pairnet_tpu.config import load_config
    from pairnet_tpu.evaluation.runner import evaluate_model
    from pairnet_tpu.train.builder import (
        build_dataset,
        build_model,
        build_pipeline_cfg,
    )

    cfg = load_config(args.config)
    model = build_model(cfg.model)
    pipe_cfg = build_pipeline_cfg(cfg, train=False)
    dataset = build_dataset(cfg, split=args.split)

    mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.work_dir, "ckpts"))
    )
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"no checkpoints under {args.work_dir}/ckpts — regenerate the "
            "fixture with `python tools/make_tiny_fixture.py`"
        )
    raw = mgr.restore(step, args=ocp.args.StandardRestore())
    variables = jax.tree_util.tree_map(jnp.asarray, raw["params"])
    print(f"restored step {step}; evaluating {len(dataset)} {args.split} images")

    results = {}
    for impl in IMPLS:
        os.environ["PAIRNET_DEFORM_IMPL"] = impl
        fwd = jax.jit(lambda v, img: model.apply(v, img))
        results[impl] = evaluate_model(
            lambda img: fwd(variables, jnp.asarray(img)),
            dataset,
            pipe_cfg,
            batch_size=1,
            mode="sgdet",
            num_predicates=cfg.num_relation_classes,
            num_things=cfg.evaluation.num_things,
            iou_thr=cfg.evaluation.get("iou_thr", 0.5),
        )

    base = IMPLS[0]
    keys = sorted(k for k in results[base] if "recall" in k)
    for k in keys:
        print(
            f"{k:30s} "
            + " ".join(f"{i}={results[i][k]:.4f}" for i in IMPLS)
        )
    dmax = max(
        abs(results[base][k] - results[i][k]) for k in keys for i in IMPLS
    )
    print(f"max |R@K delta| vs {base}:", dmax)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "max_delta": dmax}, f, indent=2)


if __name__ == "__main__":
    main()
