"""Pair-Net training targets and losses (batched, on-device, fixed shapes).

Behavioral counterpart of CrossHead2.loss / get_targets / _get_target_single
(ref: pairnet/models/relation_heads/pairnet_head.py:419-718), redesigned for
TPU: the reference loops images in Python and calls scipy on the host twice
per image; here everything is vmapped over the batch with padded GT.

Loss dict (weights from configs/mask2former/pairnet.py:146-186):
  loss_r_cls   — Seesaw CE over matched relation queries (weight 2.0),
  loss_sub_cls / loss_obj_cls — CE(134) on matched slots (weight 4.0),
  loss_match   — BCE-with-logits on the importance matrix with dynamic
                 pos_weight = numel / positives over the whole batch
                 (weight 5.0; ref: pairnet_head.py:553-562).

The panoptic cls/mask/dice losses are intentionally NOT part of the default
loss (the reference builds but never adds them — SURVEY.md §2.3); set
``with_seg_losses=True`` to train the segmenter from scratch (uniform
point-sampled mask BCE + naive dice + class CE with 0.1 background weight).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pairnet_tpu.models.losses import (
    bce_with_logits_pos_weight,
    naive_dice_loss,
    seesaw_ce,
    sigmoid_bce,
    softmax_ce,
)
from pairnet_tpu.models.matchers import (
    id_match,
    mask_hungarian_assign,
    sample_points_for_matching,
)


class PairNetTargets(NamedTuple):
    r_labels: jnp.ndarray  # (B, K) 0-based predicate or -1
    r_weights: jnp.ndarray  # (B, K) {0,1}
    sub_ids: jnp.ndarray  # (B, K) gt sub class or -1
    obj_ids: jnp.ndarray  # (B, K)
    gt_importance: jnp.ndarray  # (B, Q, Q) {0,1}
    query2gt: jnp.ndarray  # (B, Q) matched gt per query or -1
    mask_pts: jnp.ndarray  # (B, Q, P) pred mask logits at points
    gt_pts: jnp.ndarray  # (B, G, P) gt mask {0,1} at points


def _targets_single(
    cls_pred,  # (Q, C+1)
    mask_pred,  # (Q, h, w)
    sub_score,  # (K, C+1) detached
    obj_score,  # (K, C+1) detached
    rel_score,  # (K, R)
    gt_labels,  # (G,)
    gt_masks,  # (G, hg, wg)
    gt_valid,  # (G,) bool
    gt_rels,  # (Rm, 3) [sub_gt_idx, obj_gt_idx, predicate_1based]
    rel_valid,  # (Rm,) bool
    points,  # (P, 2)
):
    Q = cls_pred.shape[0]
    G = gt_labels.shape[0]
    Rm = gt_rels.shape[0]

    mask_pts, gt_pts = sample_points_for_matching(mask_pred, gt_masks, points)
    assign = mask_hungarian_assign(cls_pred, mask_pts, gt_labels, gt_pts, gt_valid)
    gt2query = assign.gt2query  # (G,) query per valid gt (always matched)

    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    rel_ok = rel_valid & (gt2query[sub_gt] >= 0) & (gt2query[obj_gt] >= 0)
    # scatter binary importance; invalid rels dropped via out-of-range index
    gt_sub_q = jnp.where(rel_ok, gt2query[sub_gt], Q)
    gt_obj_q = jnp.where(rel_ok, gt2query[obj_gt], Q)
    gt_importance = (
        jnp.zeros((Q, Q), jnp.float32)
        .at[gt_sub_q, gt_obj_q]
        .max(1.0, mode="drop")
    )

    gt_sub_cls = gt_labels[sub_gt]
    gt_obj_cls = gt_labels[obj_gt]
    gt_rel_label = gt_rels[:, 2] - 1  # 1-based -> 0-based predicate

    idres = id_match(
        sub_score, obj_score, rel_score,
        gt_sub_cls, gt_obj_cls, gt_rel_label, rel_ok,
    )
    matched = idres.relq2gt  # (K,)
    safe = jnp.clip(matched, 0, Rm - 1)
    pos = matched >= 0
    r_labels = jnp.where(pos, gt_rel_label[safe], -1)
    r_weights = pos.astype(jnp.float32)
    sub_ids = jnp.where(pos, gt_sub_cls[safe], -1)
    obj_ids = jnp.where(pos, gt_obj_cls[safe], -1)

    return (
        r_labels, r_weights, sub_ids, obj_ids, gt_importance,
        assign.query2gt, mask_pts, gt_pts,
    )


def pairnet_targets(outputs, batch, points) -> PairNetTargets:
    """Vmapped target building. ``points``: (B, P, 2) fresh uniform samples."""
    sg = jax.lax.stop_gradient
    res = jax.vmap(_targets_single)(
        sg(outputs["cls"]),
        sg(outputs["mask"]),
        sg(outputs["sub"]),
        sg(outputs["obj"]),
        sg(outputs["rel"]),
        batch["gt_labels"],
        batch["gt_masks"],
        batch["gt_valid"],
        batch["gt_rels"],
        batch["rel_valid"],
        points,
    )
    return PairNetTargets(*res)


def pairnet_loss(
    outputs,
    batch,
    rng,
    cum_samples,
    num_points: int = 12544,
    rel_loss_weight: float = 2.0,
    subobj_loss_weight: float = 4.0,
    match_loss_weight: float = 5.0,
    with_seg_losses: bool = False,
    cls_loss_weight: float = 2.0,
    mask_loss_weight: float = 5.0,
    dice_loss_weight: float = 5.0,
    bg_class_weight: float = 0.1,
):
    """Full Pair-Net loss. Returns (loss_dict, new_cum_samples).

    ``cum_samples`` is the Seesaw running class-count state (carried in the
    train state; the reference keeps it as a module buffer).
    """
    B, K, R = outputs["rel"].shape
    Cp1 = outputs["cls"].shape[-1]
    points = jax.random.uniform(rng, (B, num_points, 2))
    t = pairnet_targets(outputs, batch, points)

    w = t.r_weights.reshape(-1)
    loss_sub = softmax_ce(
        outputs["sub"].reshape(-1, Cp1), t.sub_ids.reshape(-1), w
    )
    loss_obj = softmax_ce(
        outputs["obj"].reshape(-1, Cp1), t.obj_ids.reshape(-1), w
    )
    loss_r, new_cum = seesaw_ce(
        outputs["rel"].reshape(-1, R), t.r_labels.reshape(-1), w, cum_samples
    )
    npos = jnp.maximum(jnp.sum(t.gt_importance > 0), 1.0)
    pos_weight = t.gt_importance.size / npos
    loss_match = bce_with_logits_pos_weight(
        outputs["importance"], t.gt_importance, pos_weight
    )

    losses = {
        "loss_r_cls": rel_loss_weight * loss_r,
        "loss_sub_cls": subobj_loss_weight * loss_sub,
        "loss_obj_cls": subobj_loss_weight * loss_obj,
        "loss_match": match_loss_weight * loss_match,
    }

    if with_seg_losses:
        # query -> class target: matched queries get the gt label, rest bg
        q2g = t.query2gt  # (B, Q)
        G = batch["gt_labels"].shape[1]
        safe = jnp.clip(q2g, 0, G - 1)
        matched = q2g >= 0
        take = jax.vmap(lambda a, i: a[i])
        cls_t = jnp.where(matched, take(batch["gt_labels"], safe), Cp1 - 1)
        class_weight = jnp.concatenate(
            [jnp.ones(Cp1 - 1), jnp.array([bg_class_weight])]
        )
        loss_cls = softmax_ce(
            outputs["cls"].reshape(-1, Cp1),
            cls_t.reshape(-1),
            jnp.ones_like(cls_t, jnp.float32).reshape(-1),
            class_weight=class_weight,
        )
        # mask losses on the shared sampled points, matched queries only.
        # t.mask_pts is stop-gradiented (target building); resample with grad.
        from pairnet_tpu.ops.sampling import sample_mask_points

        pred_pts = jax.vmap(sample_mask_points)(outputs["mask"], points)
        gt_for_query = jnp.take_along_axis(
            t.gt_pts, safe[..., None], axis=1
        )  # (B, Q, P)
        wq = matched.astype(jnp.float32).reshape(-1)
        loss_mask = jnp.sum(
            sigmoid_bce(pred_pts, gt_for_query).mean(-1).reshape(-1) * wq
        ) / jnp.maximum(wq.sum(), 1.0)
        loss_dice = naive_dice_loss(
            pred_pts.reshape(-1, pred_pts.shape[-1]),
            gt_for_query.reshape(-1, gt_for_query.shape[-1]),
            wq,
        )
        losses["loss_cls"] = cls_loss_weight * loss_cls
        losses["loss_mask"] = mask_loss_weight * loss_mask
        losses["loss_dice"] = dice_loss_weight * loss_dice

    losses["loss_total"] = sum(losses.values())
    return losses, new_cum
