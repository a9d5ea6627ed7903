"""On-device (jit) scene-graph recall evaluation.

The reference computes triplet matching with per-image numpy loops over
full-resolution mask IoUs (ref: sgg_metrics.py:1311-1379 — the eval hot loop,
SURVEY.md §3.2). Here the whole per-image computation is one jit program:

* mask IoUs via flattened one-hot matmuls on the MXU,
* class-equality prefilter as an integer equality matrix,
* graph-constraint matching and top-K union recall with fixed shapes.

Validated against the numpy reference engine (evaluation/sgg_eval.py) in
tests/test_device_eval.py. Aggregation (means over images / predicates)
stays on host — it is O(images), not O(pixels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("topks",))
def device_eval_single(
    gt_labels,  # (G,) 1-based; 0 = padding
    gt_rels,  # (R, 3) [sub, obj, predicate_1based]; predicate 0 = padding
    gt_masks,  # (G, H, W) bool/f32
    pred_labels,  # (M,) 1-based
    pred_pairs,  # (K, 2) indices into pred arrays, RANKED
    pred_rel_dists,  # (K, P+1)
    pred_masks,  # (M, H, W) bool/f32
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
):
    """Returns (matched@k (len(topks), R) bool, rel_valid (R,))."""
    G = gt_labels.shape[0]
    R = gt_rels.shape[0]
    K = pred_pairs.shape[0]

    rel_valid = gt_rels[:, 2] > 0
    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    gt_trip = jnp.stack(
        [gt_labels[sub_gt], gt_rels[:, 2], gt_labels[obj_gt]], -1
    )  # (R, 3)

    pred_predicate = pred_rel_dists[:, 1:].argmax(-1).astype(jnp.int32) + 1
    pred_trip = jnp.stack(
        [
            pred_labels[pred_pairs[:, 0]],
            pred_predicate,
            pred_labels[pred_pairs[:, 1]],
        ],
        -1,
    )  # (K, 3)

    cls_match = (gt_trip[:, None, :] == pred_trip[None, :, :]).all(-1)  # (R, K)

    # mask IoUs via matmul: gt instance x pred instance, then index per pair
    gm = gt_masks.reshape(G, -1).astype(jnp.float32)
    pm = pred_masks.reshape(pred_masks.shape[0], -1).astype(jnp.float32)
    inter = jnp.dot(gm, pm.T, preferred_element_type=jnp.float32)
    union = gm.sum(-1)[:, None] + pm.sum(-1)[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)  # (G, M)

    sub_iou = iou[sub_gt][:, pred_pairs[:, 0]]  # (R, K)
    obj_iou = iou[obj_gt][:, pred_pairs[:, 1]]
    match = cls_match & (sub_iou >= iou_thr) & (obj_iou >= iou_thr)
    match = match & rel_valid[:, None]

    outs = []
    for k in topks:
        kk = min(k, K)
        outs.append(match[:, :kk].any(axis=1))
    return jnp.stack(outs), rel_valid


def evaluate_device(
    gts: list[dict],
    preds: list[dict],
    num_predicates: int,
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
) -> dict:
    """Dataset-level R@K and mR@K using the on-device matcher.

    Entries carry the arrays of :func:`device_eval_single`; images may have
    different mask resolutions (one compile per distinct shape).
    """
    recalls = {k: [] for k in topks}
    mr_collect = {k: [[] for _ in range(num_predicates + 1)] for k in topks}
    for gt, pred in zip(gts, preds):
        matched, rel_valid = device_eval_single(
            jnp.asarray(gt["labels"]),
            jnp.asarray(gt["rels"]),
            jnp.asarray(gt["masks"]),
            jnp.asarray(pred["labels"]),
            jnp.asarray(pred["rel_pair_idxes"]),
            jnp.asarray(pred["rel_dists"]),
            jnp.asarray(pred["masks"]),
            iou_thr,
            topks,
        )
        matched = np.asarray(matched)
        rv = np.asarray(rel_valid)
        n_gt = max(int(rv.sum()), 1)
        predicates = np.asarray(gt["rels"])[:, 2]
        for ki, k in enumerate(topks):
            recalls[k].append(matched[ki][rv].sum() / n_gt)
            for p in range(1, num_predicates + 1):
                sel = rv & (predicates == p)
                if sel.any():
                    mr_collect[k][p].append(matched[ki][sel].mean())

    out = {}
    for k in topks:
        out[f"R@{k}"] = float(np.mean(recalls[k])) if recalls[k] else 0.0
        mr = 0.0
        for p in range(1, num_predicates + 1):
            vals = mr_collect[k][p]
            mr += float(np.mean(vals)) if vals else 0.0
        out[f"mR@{k}"] = mr / num_predicates
    return out
