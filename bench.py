#!/usr/bin/env python
"""Headline benchmark: Pair-Net R-50 sgdet inference throughput on one chip.

Measures images/sec for the full flagship model (ResNet-50 + MSDeformAttn
pixel decoder + 9-layer masked-attn decoder + PPN + Relation Fusion + head
outputs) at the reference eval resolution 1333x800 (padded 800x1344).

The reference publishes no throughput numbers (SURVEY.md §6); the baseline
constant below is the documented estimate for the reference PyTorch stack on
its RTX 3090-class GPUs (Mask2Former-R50-sized models run ~10 img/s at this
resolution in mmdetection). North star: >= 8x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    # CPU AOT cache reload is broken in this image (SIGILL/hangs); TPU only
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

REFERENCE_GPU_IMG_PER_S = 10.0  # documented estimate, see module docstring


def main():
    # default = the postprocess-INCLUSIVE sgdet inference path (forward +
    # panoptic fusion + triplet ranking) — the metric the reference's
    # tools/test.py flow actually measures.  BENCH_MODE=fwd for bare
    # forward, =train for the full train step.
    mode = os.environ.get("BENCH_MODE", "eval")
    if mode == "train":
        return bench_train()
    if mode == "eval":
        return bench_eval()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship

    backbone = os.environ.get("BENCH_MODEL", "r50")  # r50 | swinb
    model = _flagship(backbone=backbone)
    B = int(os.environ.get("BENCH_BATCH", "8"))
    H, W = map(int, os.environ.get("BENCH_HW", "800x1344").split("x"))
    # random (not constant) input: the tunneled runtime can elide repeated
    # identical executions, producing fantasy numbers
    img = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    # production inference runs bf16 (matmul accumulation stays f32 via
    # preferred_element_type; softmax/normalization sites upcast explicitly)
    dtype = dict(bf16=jnp.bfloat16, f32=jnp.float32)[
        os.environ.get("BENCH_DTYPE", "bf16")
    ]
    if dtype != jnp.float32:
        cast = lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t
        variables = jax.tree_util.tree_map(cast, variables)
        img = img.astype(dtype)
        # int4 pair-channel fused-level kernel (v16) for bf16 inference:
        # v14's select-merge windows with the 2x2 bilinear footprint of
        # TWO channels nibble-packed per int32 lane — half the per-visit
        # gather/select/carry traffic (-12% op, +6% e2e over v14; R@K
        # delta vs v14 within fixture noise, docs/ab_dtype_fulldim_v16.json);
        # training keeps the exact-backward v7/v6 dispatch
        os.environ.setdefault("PAIRNET_DEFORM_IMPL", "pallas_v16")
    fwd = jax.jit(lambda v, x: model.apply(v, x))

    # Timing methodology for the tunneled (axon) runtime, validated against
    # known-FLOP matmuls (~100 TFLOP/s measured):
    # 1. CHAIN iterations (each forward consumes the previous output) — the
    #    runtime memoizes repeated identical executions by content.
    # 2. End with a SCALAR VALUE FETCH — block_until_ready does NOT block on
    #    this backend; only device->host reads wait for execution.
    def chained(v, x):
        out = fwd(v, x)
        x = jnp.roll(x, 1, axis=2) + (0.01 * out["rel"].mean()).astype(x.dtype)
        return x, out

    chained = jax.jit(chained)
    x, out = chained(variables, img)
    _ = float(out["rel"][0, 0, 0].astype(jnp.float32))  # warm: compile + run

    n_iters = int(os.environ.get("BENCH_ITERS", "6"))
    x = img
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x, out = chained(variables, x)
    _ = float(out["rel"][0, 0, 0].astype(jnp.float32))  # forces completion
    dt = time.perf_counter() - t0
    img_per_s = B * n_iters / dt

    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_pairnet_%s_sgdet_1333x800" % backbone,
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / REFERENCE_GPU_IMG_PER_S, 3),
            }
        )
    )


def bench_train():
    """Full train step (fwd + on-device Hungarian targets + losses + bwd +
    AdamW) at 800x1344 batch 4 — VERDICT r1 #2's train-step benchmark."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from pairnet_tpu.train.optim import build_optimizer
    from pairnet_tpu.train.trainer import TrainState, make_train_step

    model = _flagship()
    B = int(os.environ.get("BENCH_BATCH", "4"))
    H, W = map(int, os.environ.get("BENCH_HW", "800x1344").split("x"))
    G, R = 24, 40
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32),
        "gt_labels": jnp.asarray(rng.integers(0, 133, size=(B, G)), jnp.int32),
        "gt_masks": jnp.asarray(
            rng.uniform(size=(B, G, H // 4, W // 4)) > 0.8, jnp.float32
        ),
        "gt_valid": jnp.asarray(np.ones((B, G), bool)),
        "gt_rels": jnp.asarray(
            np.stack(
                [rng.integers(0, G, (B, R)), rng.integers(0, G, (B, R)),
                 rng.integers(1, 56, (B, R))], -1,
            ), jnp.int32,
        ),
        "rel_valid": jnp.asarray(np.ones((B, R), bool)),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    tx = build_optimizer(variables["params"])
    state = TrainState.create(variables, tx, 56)
    compute_dtype = dict(bf16=jnp.bfloat16, f32=None)[
        os.environ.get("BENCH_DTYPE", "bf16")
    ]
    step = jax.jit(
        make_train_step(
            model, tx, {"num_points": 12544}, compute_dtype=compute_dtype
        )
    )

    def chained(st, bt):
        st, metrics = step(st, bt)
        bt = dict(bt)
        bt["image"] = jnp.roll(bt["image"], 1, axis=2) + (
            1e-6 * metrics["loss_total"]
        ).astype(bt["image"].dtype)
        return st, bt, metrics

    chained = jax.jit(chained)
    state, b2, metrics = chained(state, batch)
    _ = float(metrics["loss_total"])  # compile + run
    n_iters = int(os.environ.get("BENCH_ITERS", "4"))
    b2 = batch
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, b2, metrics = chained(state, b2)
    _ = float(metrics["loss_total"])
    dt = time.perf_counter() - t0
    img_per_s = B * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_pairnet_r50_800x1344",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / REFERENCE_GPU_IMG_PER_S, 3),
            }
        )
    )


def bench_eval():
    """Forward + full on-device postprocess (panoptic fusion, triplet
    ranking) — the sgdet inference path incl postprocess (VERDICT r1 weak #1)."""
    import time

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from pairnet_tpu.models.heads.pairnet_inference import pairnet_postprocess

    backbone = os.environ.get("BENCH_MODEL", "r50")  # r50 | swinb
    model = _flagship(backbone=backbone)
    B = int(os.environ.get("BENCH_BATCH", "8"))
    H, W = map(int, os.environ.get("BENCH_HW", "800x1344").split("x"))
    img = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    dtype = dict(bf16=jnp.bfloat16, f32=jnp.float32)[
        os.environ.get("BENCH_DTYPE", "bf16")
    ]
    if dtype != jnp.float32:
        cast = lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t
        variables = jax.tree_util.tree_map(cast, variables)
        img = img.astype(dtype)
        # see main(): int4 pair-channel kernel (v16) for bf16 inference
        os.environ.setdefault("PAIRNET_DEFORM_IMPL", "pallas_v16")

    def fwd_post(v, x):
        out = model.apply(v, x)
        preds = [pairnet_postprocess(out, b, num_things=80) for b in range(B)]
        return preds[0].r_scores, preds

    def chained(v, x):
        scores, preds = fwd_post(v, x)
        x = jnp.roll(x, 1, axis=2) + (0.01 * scores[0]).astype(x.dtype)
        return x, preds

    chained = jax.jit(chained)
    x, preds = chained(variables, img)
    _ = float(preds[0].r_scores[0])
    n_iters = int(os.environ.get("BENCH_ITERS", "6"))
    x = img
    t0 = time.perf_counter()
    for _ in range(n_iters):
        x, preds = chained(variables, x)
    _ = float(preds[0].r_scores[0])
    dt = time.perf_counter() - t0
    img_per_s = B * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "images_per_sec_per_chip_pairnet_%s_sgdet_e2e_1333x800" % backbone,
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / REFERENCE_GPU_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
