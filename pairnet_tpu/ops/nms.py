"""Fixed-shape, jit-compatible NMS.

Replaces mmcv's CUDA NMS / batched NMS (ref: SURVEY.md §2.4; used by the
two-stage panoptic path, pairnet/models/frameworks/sg_panoptic_fpn.py:75-77,
and multiclass_nms_alt, pairnet/utils.py:104-198) with a sort + greedy
IoU-suppression sweep whose iteration count is static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import box_iou


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS. boxes (N, 4) xyxy, scores (N,).

    Returns a bool keep mask aligned with the input order. ``valid`` masks
    out padded entries. Fixed shapes: always N iterations of O(N) work.
    """
    N = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((N,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    b = boxes[order]
    v = valid[order]
    iou, _ = box_iou(b, b)

    def body(i, state):
        keep, suppressed = state
        is_kept = v[i] & ~suppressed[i]
        keep = keep.at[i].set(is_kept)
        suppressed = suppressed | (is_kept & (iou[i] > iou_threshold))
        return keep, suppressed

    keep_sorted, _ = jax.lax.fori_loop(
        0, N, body, (jnp.zeros((N,), bool), jnp.zeros((N,), bool))
    )
    keep = jnp.zeros((N,), bool).at[order].set(keep_sorted)
    return keep


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    labels: jnp.ndarray,
    iou_threshold: float = 0.5,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Class-aware NMS via the class-offset trick (torchvision semantics)."""
    max_coord = jnp.max(jnp.abs(boxes)) + 1.0
    offsets = labels.astype(boxes.dtype)[:, None] * (2.0 * max_coord)
    return nms(boxes + offsets, scores, iou_threshold, valid)


def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    valid: jnp.ndarray | None = None,
):
    """Multi-class NMS keeping full score distributions.

    boxes (N, 4); scores (N, C) *without* background column. Mirrors the
    semantics of the reference's ``multiclass_nms_alt``
    (ref: pairnet/utils.py:104-198) but with fixed output size
    ``max_per_img``: every (box, class) pair above ``score_thr`` competes,
    class-aware suppression, top ``max_per_img`` by score.

    Returns (boxes (K,4), scores (K,), labels (K,), dists (K,C), keep_mask (K,))
    with K = max_per_img; padded slots have keep_mask False.
    """
    N, C = scores.shape
    if valid is None:
        valid = jnp.ones((N,), bool)
    flat_scores = scores.reshape(-1)  # (N*C,)
    flat_labels = jnp.tile(jnp.arange(C, dtype=jnp.int32), N)
    flat_boxes = jnp.repeat(boxes, C, axis=0)
    flat_valid = jnp.repeat(valid, C) & (flat_scores > score_thr)
    box_ids = jnp.repeat(jnp.arange(N, dtype=jnp.int32), C)

    keep = batched_nms(
        flat_boxes, flat_scores, flat_labels, iou_threshold, flat_valid
    )
    ranked = jnp.argsort(-jnp.where(keep, flat_scores, -jnp.inf))[:max_per_img]
    kmask = keep[ranked]
    return (
        flat_boxes[ranked],
        jnp.where(kmask, flat_scores[ranked], 0.0),
        flat_labels[ranked],
        scores[box_ids[ranked]],
        kmask,
    )
