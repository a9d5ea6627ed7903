"""Loss functions (pure, fixed-shape, mask-weighted).

Behavioral counterparts of the losses the reference builds from mmdet /
pairnet.losses.seg_losses (ref: configs/mask2former/pairnet.py:146-186):

* Seesaw CE (mmdet SeesawLoss, p=0.8 q=2.0) for relation classification,
  including the running per-class cumulative sample counts — carried
  explicitly as ``cum_samples`` state instead of a module buffer.
* weighted softmax CE (mmdet CrossEntropyLoss) for sub/obj/object class.
* BCE-with-logits with dynamic pos_weight for the importance matrix
  (ref: pairnet/models/losses/seg_losses.py:154-166,
  pairnet_head.py:553-562).
* point-sampled mask BCE + naive dice (mmdet CrossEntropyLoss use_sigmoid /
  DiceLoss naive_dice eps=1.0) for heads that train segmentation.

All reductions are weighted means: sum(loss * w) / max(sum(w), eps) so
padded slots never contribute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _wmean(x, w, eps=1e-7):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), eps)


def softmax_ce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    weights: jnp.ndarray,
    class_weight: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Weighted-mean softmax cross entropy. labels clipped for padded slots.

    Matches torch F.cross_entropy(weight=class_weight) semantics: the mean
    is normalized by the summed per-sample class weights.
    """
    C = logits.shape[-1]
    labels_safe = jnp.clip(labels, 0, C - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = class_weight[labels_safe]
        return jnp.sum(nll * cw * weights) / jnp.maximum(
            jnp.sum(cw * weights), 1e-7
        )
    return _wmean(nll, weights)


def seesaw_ce(
    logits: jnp.ndarray,  # (N, C) class logits (objectness cols excluded)
    labels: jnp.ndarray,  # (N,) int
    weights: jnp.ndarray,  # (N,) {0,1}
    cum_samples: jnp.ndarray,  # (C,) float running counts
    p: float = 0.8,
    q: float = 2.0,
    eps: float = 1e-2,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """mmdet seesaw_ce_loss. Returns (loss, updated cum_samples).

    Counts are updated BEFORE computing the weights (mmdet SeesawLoss.forward
    updates the buffer first).
    """
    C = logits.shape[-1]
    labels_safe = jnp.clip(labels, 0, C - 1)
    onehot = jax.nn.one_hot(labels_safe, C, dtype=jnp.float32) * weights[..., None]
    cum_samples = cum_samples + onehot.sum(axis=0)

    seesaw = jnp.ones((labels_safe.shape[0], C), jnp.float32)
    if p > 0:
        cs = jnp.maximum(cum_samples, 1.0)
        ratio = cs[None, :] / cs[:, None]  # (C, C): N_j / N_i
        mitig = jnp.where(ratio < 1.0, jnp.power(ratio, p), 1.0)
        seesaw = seesaw * mitig[labels_safe]
    if q > 0:
        scores = jax.nn.softmax(
            jax.lax.stop_gradient(logits).astype(jnp.float32), axis=-1
        )
        self_scores = jnp.take_along_axis(scores, labels_safe[:, None], axis=-1)
        score_ratio = scores / jnp.maximum(self_scores, eps)
        comp = jnp.where(score_ratio > 1.0, jnp.power(score_ratio, q), 1.0)
        seesaw = seesaw * comp

    gt_onehot = jax.nn.one_hot(labels_safe, C, dtype=jnp.float32)
    adj_logits = logits.astype(jnp.float32) + jnp.log(seesaw) * (1.0 - gt_onehot)
    logp = jax.nn.log_softmax(adj_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels_safe[:, None], axis=-1)[:, 0]
    return _wmean(nll, weights), cum_samples


def bce_with_logits_pos_weight(
    logits: jnp.ndarray, targets: jnp.ndarray, pos_weight: jnp.ndarray
) -> jnp.ndarray:
    """torch BCEWithLogitsLoss(pos_weight=...), mean over all elements."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    log_sig = jax.nn.log_sigmoid(x)
    log_one_minus = jax.nn.log_sigmoid(-x)
    loss = -(pos_weight * t * log_sig + (1.0 - t) * log_one_minus)
    return jnp.mean(loss)


def sigmoid_bce(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Elementwise BCE-with-logits (no reduction)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return -(t * jax.nn.log_sigmoid(x) + (1.0 - t) * jax.nn.log_sigmoid(-x))


def bce_focal_loss(
    logits: jnp.ndarray,  # (N, C)
    targets: jnp.ndarray,  # (N, C) {0,1}
    num_matches: jnp.ndarray | float,
    gamma: float = 2.0,
    alpha: float = 0.25,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Sigmoid focal BCE, `.mean(1).sum() / num_matches` reduction.

    Counterpart of the reference's BCEFocalLoss
    (ref: pairnet/models/losses/seg_losses.py:103-121).
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(x)
    ce = -(t * jax.nn.log_sigmoid(x) + (1.0 - t) * jax.nn.log_sigmoid(-x))
    p_t = prob * t + (1.0 - prob) * (1.0 - t)
    loss = ce * jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        loss = (alpha * t + (1.0 - alpha) * (1.0 - t)) * loss
    return loss_weight * jnp.sum(jnp.mean(loss, axis=1)) / num_matches


def multilabel_focal_loss(
    logits: jnp.ndarray,  # (N, C)
    labels: jnp.ndarray,  # (N,) int
    weights: jnp.ndarray,  # (N,) {0,1} valid mask
    class_weight: jnp.ndarray | None = None,  # (C,)
    gamma: float = 2.0,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """Softmax focal NLL with per-class weights, weighted-mean reduction.

    Counterpart of the reference's MultilabelFocalLoss — NLL of
    (1-p)^gamma * log p at the target class, torch nll_loss(weight=...)
    normalization (ref: pairnet/models/losses/seg_losses.py:124-150).
    """
    C = logits.shape[-1]
    labels_safe = jnp.clip(labels, 0, C - 1)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    focal_logp = jnp.power(1.0 - jnp.exp(logp), gamma) * logp
    nll = -jnp.take_along_axis(focal_logp, labels_safe[..., None], axis=-1)[..., 0]
    if class_weight is not None:
        cw = class_weight[labels_safe]
        return loss_weight * jnp.sum(nll * cw * weights) / jnp.maximum(
            jnp.sum(cw * weights), 1e-7
        )
    return loss_weight * _wmean(nll, weights)


def naive_dice_loss(
    pred_logits: jnp.ndarray,  # (N, P) mask logits at sampled points
    targets: jnp.ndarray,  # (N, P) {0,1}
    weights: jnp.ndarray,  # (N,)
    eps: float = 1.0,
) -> jnp.ndarray:
    """mmdet DiceLoss(naive_dice=True, activate=True, eps=1.0)."""
    p = jax.nn.sigmoid(pred_logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)
    num = 2.0 * jnp.sum(p * t, axis=-1)
    den = jnp.sum(p, axis=-1) + jnp.sum(t, axis=-1)
    loss = 1.0 - (num + eps) / (den + eps)
    return _wmean(loss, weights)
