"""Torch-parity tests for the focal losses.

Reference semantics: pairnet/models/losses/seg_losses.py:103-150
(BCEFocalLoss, MultilabelFocalLoss).
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pairnet_tpu.models.losses import bce_focal_loss, multilabel_focal_loss


def torch_bce_focal(inputs, targets, num_matches, gamma=2.0, alpha=0.25):
    prob = inputs.sigmoid()
    ce = F.binary_cross_entropy_with_logits(inputs, targets, reduction="none")
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss.mean(1).sum() / num_matches


def torch_multilabel_focal(logits, labels, weight, gamma=2.0):
    log_prob = F.log_softmax(logits, dim=-1)
    prob = torch.exp(log_prob)
    return F.nll_loss(
        ((1 - prob) ** gamma) * log_prob, labels, weight=weight,
        reduction="mean",
    )


def test_bce_focal_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(7, 13)).astype(np.float32)
    t = (rng.uniform(size=(7, 13)) > 0.7).astype(np.float32)
    ours = bce_focal_loss(jnp.asarray(x), jnp.asarray(t), 5.0)
    ref = torch_bce_focal(torch.from_numpy(x), torch.from_numpy(t), 5.0)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_bce_focal_no_alpha():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 9)).astype(np.float32)
    t = (rng.uniform(size=(4, 9)) > 0.5).astype(np.float32)
    ours = bce_focal_loss(jnp.asarray(x), jnp.asarray(t), 2.0, alpha=-1.0)
    ref = torch_bce_focal(torch.from_numpy(x), torch.from_numpy(t), 2.0, alpha=-1)
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_multilabel_focal_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(11, 6)).astype(np.float32)
    y = rng.integers(0, 6, size=(11,))
    cw = rng.uniform(0.5, 2.0, size=(6,)).astype(np.float32)
    ours = multilabel_focal_loss(
        jnp.asarray(x), jnp.asarray(y), jnp.ones(11), class_weight=jnp.asarray(cw)
    )
    ref = torch_multilabel_focal(
        torch.from_numpy(x), torch.from_numpy(y), torch.from_numpy(cw)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_multilabel_focal_masks_padded_rows():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 5)).astype(np.float32)
    y = rng.integers(0, 5, size=(8,))
    w = np.array([1, 1, 1, 1, 1, 0, 0, 0], np.float32)
    ours = multilabel_focal_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    ref = torch_multilabel_focal(
        torch.from_numpy(x[:5]), torch.from_numpy(y[:5]),
        torch.ones(5),
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
