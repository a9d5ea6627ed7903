"""Box and mask geometry ops (pure XLA, fixed shapes).

Re-provides: torchvision ``box_convert`` (ref: pairnet/utils.py:39),
``masks_to_boxes`` (ref: pairnet/utils.py:14-40), box/mask IoU and
generalized IoU used by matchers and the eval engine
(ref: pairnet/evaluation/sgg_metrics.py:1374-1379).
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7):
    """Pairwise IoU. a: (N, 4), b: (M, 4) xyxy -> iou (N, M), union (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, eps), union


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7):
    """Pairwise GIoU (N, M); boxes xyxy."""
    iou, union = box_iou(a, b, eps)
    lt = jnp.minimum(a[:, None, :2], b[None, :, :2])
    rb = jnp.maximum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    hull = jnp.maximum(wh[..., 0] * wh[..., 1], eps)
    return iou - (hull - union) / hull


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) {0,1} masks -> (N, 4) xyxy boxes; empty masks -> zeros.

    Same semantics as the reference's utils.masks_to_boxes
    (ref: pairnet/utils.py:14-40).
    """
    N, H, W = masks.shape
    m = masks > 0.5
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    big = jnp.float32(1e8)
    x_any = m.any(axis=1)  # (N, W)
    y_any = m.any(axis=2)  # (N, H)
    x0 = jnp.min(jnp.where(x_any, xs[None, :], big), axis=1)
    x1 = jnp.max(jnp.where(x_any, xs[None, :] + 1, -big), axis=1)
    y0 = jnp.min(jnp.where(y_any, ys[None, :], big), axis=1)
    y1 = jnp.max(jnp.where(y_any, ys[None, :] + 1, -big), axis=1)
    empty = ~m.any(axis=(1, 2))
    boxes = jnp.stack([x0, y0, x1, y1], axis=-1)
    return jnp.where(empty[:, None], 0.0, boxes)


def mask_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise mask IoU via matmul. a: (N, H, W), b: (M, H, W) in {0,1}.

    Intersections/areas computed as one-hot matmuls so the whole (N, M)
    matrix stays on device (ref semantics: sgg_metrics.py:1374-1379).
    """
    N = a.shape[0]
    M = b.shape[0]
    af = (a > 0.5).reshape(N, -1).astype(jnp.float32)
    bf = (b > 0.5).reshape(M, -1).astype(jnp.float32)
    inter = af @ bf.T
    union = af.sum(-1)[:, None] + bf.sum(-1)[None, :] - inter
    return inter / jnp.maximum(union, eps)
