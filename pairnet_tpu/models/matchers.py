"""On-device matching costs and assigners (fixed shapes, batched).

Behavioral counterparts of the reference's assigners, minus the host syncs:

* ClassificationCost / CrossEntropyLossCost / DiceCost as used by
  ``MaskHungarianAssigner`` (ref: pairnet/models/panoptic_heads/
  mask_hungarian_assigner.py:19-133; cost weights cls 2.0 / mask 5.0 /
  dice 5.0 from configs/mask2former/pairnet.py:199-205),
* ``IdMatcher`` triplet assignment on (sub-class, obj-class, predicate)
  classification costs (ref: pairnet/models/relation_heads/approaches/
  matcher.py:208-274; weights 1.0/1.0/0.0 from pairnet.py:193-197).

Both solve the assignment with the on-device Hungarian
(:mod:`pairnet_tpu.ops.hungarian`) instead of scipy-on-CPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pairnet_tpu.ops.hungarian import hungarian
from pairnet_tpu.ops.sampling import sample_mask_points


def classification_cost(logits: jnp.ndarray, gt_labels: jnp.ndarray) -> jnp.ndarray:
    """mmdet ClassificationCost: -softmax(logits)[:, gt_labels]. (N, G)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return -probs[:, jnp.clip(gt_labels, 0, logits.shape[-1] - 1)]


def bce_mask_cost(pred_pts: jnp.ndarray, gt_pts: jnp.ndarray) -> jnp.ndarray:
    """mmdet CrossEntropyLossCost(use_sigmoid=True) on sampled points.

    pred_pts: (N, P) logits; gt_pts: (G, P) {0,1}. Returns (N, G), averaged
    over P.
    """
    x = pred_pts.astype(jnp.float32)
    pos = -jax.nn.log_sigmoid(x)  # BCE vs target 1
    neg = -jax.nn.log_sigmoid(-x)  # BCE vs target 0
    g = gt_pts.astype(jnp.float32)
    P = x.shape[-1]
    return (pos @ g.T + neg @ (1.0 - g).T) / P


def dice_cost(
    pred_pts: jnp.ndarray, gt_pts: jnp.ndarray, eps: float = 1.0
) -> jnp.ndarray:
    """mmdet DiceCost(pred_act=True, naive, eps=1.0). (N, G)."""
    p = jax.nn.sigmoid(pred_pts.astype(jnp.float32))
    g = gt_pts.astype(jnp.float32)
    num = 2.0 * (p @ g.T)
    den = p.sum(-1)[:, None] + g.sum(-1)[None, :]
    return 1.0 - (num + eps) / (den + eps)


class MaskAssignResult(NamedTuple):
    query2gt: jnp.ndarray  # (Q,) gt index per query or -1
    gt2query: jnp.ndarray  # (G,) query index per gt or -1


def mask_hungarian_assign(
    cls_logits: jnp.ndarray,  # (Q, C+1)
    mask_pts: jnp.ndarray,  # (Q, P) point-sampled mask logits
    gt_labels: jnp.ndarray,  # (G,)
    gt_mask_pts: jnp.ndarray,  # (G, P) point-sampled {0,1}
    gt_valid: jnp.ndarray,  # (G,) bool
    cls_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
) -> MaskAssignResult:
    """Query <-> GT-segment Hungarian on cls+mask-BCE+dice point costs."""
    cost = (
        cls_weight * classification_cost(cls_logits, gt_labels)
        + mask_weight * bce_mask_cost(mask_pts, gt_mask_pts)
        + dice_weight * dice_cost(mask_pts, gt_mask_pts)
    )
    row2col, col2row = hungarian(cost, col_mask=gt_valid)
    return MaskAssignResult(query2gt=row2col, gt2query=col2row)


def focal_cost(
    logits: jnp.ndarray,
    gt_labels: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
    eps: float = 1e-12,
) -> jnp.ndarray:
    """mmdet FocalLossCost (binary_input=False): per-class focal pos/neg cost
    difference indexed at the gt label (ref: mmdet match_costs; used by the
    bbox_assigner in configs/deformable_detr/cross_r101_vg.py:158-163)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    pos = -alpha * ((1.0 - p) ** gamma) * jnp.log(p + eps)
    neg = -(1.0 - alpha) * (p**gamma) * jnp.log(1.0 - p + eps)
    return (pos - neg)[:, gt_labels]  # (N, G)


class BoxAssignResult(NamedTuple):
    query2gt: jnp.ndarray  # (Q,) matched gt per query or -1
    gt2query: jnp.ndarray  # (G,) matched query per valid gt


def box_hungarian_assign(
    cls_logits: jnp.ndarray,  # (Q, C) sigmoid-style class logits
    boxes: jnp.ndarray,  # (Q, 4) normalized cxcywh
    gt_labels: jnp.ndarray,  # (G,)
    gt_boxes: jnp.ndarray,  # (G, 4) normalized cxcywh
    gt_valid: jnp.ndarray,  # (G,) bool
    img_hw: jnp.ndarray,  # (2,) resized image (h, w) for the gIoU scale
    cls_weight: float = 2.0,
    l1_weight: float = 5.0,
    giou_weight: float = 2.0,
) -> BoxAssignResult:
    """mmdet HungarianAssigner with FocalLossCost 2 / BBoxL1Cost(xywh) 5 /
    IoUCost(giou) 2 (ref: configs/deformable_detr/cross_r101_vg.py:158-163),
    solved on-device."""
    from pairnet_tpu.ops.boxes import cxcywh_to_xyxy, generalized_box_iou

    cost = cls_weight * focal_cost(cls_logits, gt_labels)
    cost = cost + l1_weight * jnp.abs(boxes[:, None] - gt_boxes[None]).sum(-1)
    scale = jnp.concatenate([img_hw[::-1], img_hw[::-1]]).astype(jnp.float32)
    giou = generalized_box_iou(
        cxcywh_to_xyxy(boxes) * scale, cxcywh_to_xyxy(gt_boxes) * scale
    )
    cost = cost + giou_weight * (-giou)
    row2col, col2row = hungarian(cost, col_mask=gt_valid)
    return BoxAssignResult(query2gt=row2col, gt2query=col2row)


class IdMatchResult(NamedTuple):
    relq2gt: jnp.ndarray  # (K,) gt-relation index per relation query or -1
    gt2relq: jnp.ndarray  # (R,) relation query per gt relation or -1


def id_match(
    sub_score: jnp.ndarray,  # (K, C+1) detached gathered class logits
    obj_score: jnp.ndarray,  # (K, C+1)
    rel_score: jnp.ndarray,  # (K, R)
    gt_sub_cls: jnp.ndarray,  # (Rm,)
    gt_obj_cls: jnp.ndarray,  # (Rm,)
    gt_rel_labels: jnp.ndarray,  # (Rm,) 0-based predicate
    rel_valid: jnp.ndarray,  # (Rm,) bool
    sub_weight: float = 1.0,
    obj_weight: float = 1.0,
    rel_weight: float = 0.0,
) -> IdMatchResult:
    """Pair-Net triplet assignment (IdMatcher)."""
    cost = sub_weight * classification_cost(sub_score, gt_sub_cls) + (
        obj_weight * classification_cost(obj_score, gt_obj_cls)
    )
    if rel_weight != 0.0:
        cost = cost + rel_weight * classification_cost(rel_score, gt_rel_labels)
    row2col, col2row = hungarian(cost, col_mask=rel_valid)
    return IdMatchResult(relq2gt=row2col, gt2relq=col2row)


def sample_points_for_matching(
    mask_logits: jnp.ndarray,  # (Q, h, w)
    gt_masks: jnp.ndarray,  # (G, hg, wg)
    points: jnp.ndarray,  # (P, 2) in [0,1], shared (ref pairnet_head.py:630)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Point-sample predictions and GT at shared normalized coordinates."""
    pred_pts = sample_mask_points(mask_logits, points)
    gt_pts = sample_mask_points(gt_masks.astype(jnp.float32), points)
    return pred_pts, gt_pts
