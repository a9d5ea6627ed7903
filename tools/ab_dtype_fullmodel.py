#!/usr/bin/env python
"""Full-model bf16-vs-f32 R@K bound on a production-width checkpoint.

VERDICT r3 #2: the headline bench runs bf16 + the int8 v12 kernel, but
kernel-choice A/Bs (tools/ab_kernel_precision.py) only bound kernel
numerics at FIXED bf16 inputs. This tool bounds the thing that actually
matters for serving: the R@K / mR@K delta between the f32 oracle model and
the full bf16 serving configuration (bf16 params + activations + the
``--impl`` kernel, default the v14 serving kernel; pass ``pallas_v16`` to
bound the int4 path), on a checkpoint with PRODUCTION widths (embed 256 — the embed-32
tiny fixture exaggerates threshold flips because every query memorizes one
output).

The known discrete failure mode is Mask2Former's masked attention
(ref: pairnet/models/relation_heads/pairnet_head.py:247-258): the mask is
``sigmoid(interp(mask_logits)) < 0.5``, so logits near zero flip whole
attention regions under dtype jitter. The mask-threshold PATH (einsum
accumulation, resize, sigmoid/compare) already runs f32 in both configs —
the residual delta measured here is upstream bf16 rounding shifting
near-zero logits across the threshold, which is the irreducible definition
of "serving in bf16".

Usage:
    python tools/make_tiny_fixture.py --full-dim    # once, ~10 min on v5e
    python tools/ab_dtype_fullmodel.py configs/pairnet/fulldim_synthetic.py \
        work_dirs/fulldim_fixture --split train
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
    ap.add_argument("config", nargs="?", default="configs/pairnet/fulldim_synthetic.py")
    ap.add_argument("work_dir", nargs="?", default="work_dirs/fulldim_fixture")
    ap.add_argument("--split", default="train", choices=["train", "test"])
    ap.add_argument(
        "--impl", default="pallas_v14",
        help="deform-attn kernel for the bf16 serving config (the f32 "
        "oracle always runs the exact default dispatch)",
    )
    ap.add_argument("--out")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from pairnet_tpu.config import load_config
    from pairnet_tpu.evaluation.runner import evaluate_model
    from pairnet_tpu.train.builder import (
        build_dataset,
        build_detector,
        build_pipeline_cfg,
    )

    cfg = load_config(args.config)
    model = build_detector(cfg)
    pipe_cfg = build_pipeline_cfg(cfg, train=False)
    dataset = build_dataset(cfg, split=args.split)

    mgr = ocp.CheckpointManager(
        os.path.abspath(os.path.join(args.work_dir, "ckpts"))
    )
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(
            f"no checkpoints under {args.work_dir}/ckpts — regenerate with "
            "`python tools/make_tiny_fixture.py --full-dim`"
        )
    raw = mgr.restore(step, args=ocp.args.StandardRestore())
    params_f32 = jax.tree_util.tree_map(jnp.asarray, raw["params"])
    print(f"restored step {step}; evaluating {len(dataset)} {args.split} images")

    results = {}
    for tag in ("f32", "bf16"):
        if tag == "bf16":
            variables = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16)
                if t.dtype == jnp.float32
                else t,
                params_f32,
            )
            os.environ["PAIRNET_DEFORM_IMPL"] = args.impl
            in_dtype = jnp.bfloat16
        else:
            variables = params_f32
            os.environ.pop("PAIRNET_DEFORM_IMPL", None)
            in_dtype = jnp.float32
        fwd = jax.jit(
            lambda v, img: jax.tree_util.tree_map(
                lambda t: t.astype(jnp.float32)
                if t.dtype == jnp.bfloat16
                else t,
                model.apply(v, img),
            )
        )
        apply_fn = lambda img: fwd(variables, jnp.asarray(img).astype(in_dtype))
        metrics = evaluate_model(
            apply_fn,
            dataset,
            pipe_cfg,
            batch_size=1,
            mode="sgdet",
            num_predicates=cfg.num_relation_classes,
            num_things=cfg.evaluation.num_things,
            iou_thr=cfg.evaluation.get("iou_thr", 0.5),
        )
        results[tag] = {
            k: round(float(v), 4)
            for k, v in metrics.items()
            if "R@" in k or "mR@" in k
        }
        print(tag, json.dumps(results[tag]))

    deltas = {
        k: round(results["bf16"][k] - results["f32"][k], 4)
        for k in results["f32"]
    }
    worst = max(abs(v) for v in deltas.values())
    print("deltas bf16-f32:", json.dumps(deltas))
    print(f"max |delta| = {worst}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"results": results, "deltas": deltas, "max_abs": worst}, f, indent=2)


if __name__ == "__main__":
    main()
