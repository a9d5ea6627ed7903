"""PSGFormer+ baseline head: forward, loss, postprocess smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.baseline_head import (
    BaselineHead,
    baseline_loss,
    baseline_postprocess,
    masked_multilabel_ce,
)
from tests.test_pairnet_model import _fake_batch


@pytest.fixture(scope="module")
def tiny_baseline():
    head = BaselineHead(
        num_classes=7,
        num_relations=5,
        num_obj_query=20,
        num_rel_query=16,
        embed_dims=32,
        num_heads=4,
        num_decoder_layers=3,
        num_relation_layers=2,
        pixel_decoder_layers=1,
    )
    return PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)


@pytest.fixture(scope="module")
def baseline_fwd(tiny_baseline):
    """Shared init + forward compile (suite is compile-bound, 1 core)."""
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng)
    params = jax.jit(tiny_baseline.init)(jax.random.PRNGKey(0), batch["image"])
    out = jax.jit(tiny_baseline.apply)(params, batch["image"])
    return batch, params, out


def test_forward_shapes(tiny_baseline, baseline_fwd):
    batch, params, out = baseline_fwd
    B, Q, K = 2, 20, 16
    assert out["cls"].shape == (B, Q, 8)
    assert out["rel"].shape == (B, K, 6)  # num_relations + bg
    assert out["subject_scores"].shape == (B, K, Q)
    assert len(out["cls_layers"]) == 3
    assert (np.asarray(out["sub_pos"]) < Q).all()


def test_loss_and_grad(tiny_baseline, baseline_fwd):
    batch, params, _out = baseline_fwd

    def loss_fn(p):
        out = tiny_baseline.apply(p, batch["image"])
        losses = baseline_loss(out, batch, jax.random.PRNGKey(7), num_points=128)
        return losses["loss_total"], losses

    (total, losses), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    # per-layer aux seg losses present
    assert "d0.loss_cls" in losses and "loss_cls" in losses
    for k in ("r_loss_cls", "loss_subject_match", "loss_object_match"):
        assert np.isfinite(float(losses[k])), k
    gnorm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["params"]["backbone"])
    )
    assert gnorm > 0


def test_postprocess(tiny_baseline, baseline_fwd):
    batch, params, out = baseline_fwd
    pred = jax.jit(lambda o: baseline_postprocess(o, 0, num_things=4))(
        {k: v for k, v in out.items() if not isinstance(v, list)}
    )
    K = 16
    assert pred.r_dists.shape == (K, 6)
    assert pred.labels.shape == (2 * K,)
    assert (np.asarray(pred.r_labels) >= 1).all()
    # ranking is by descending predicate probability
    scores = np.asarray(pred.r_scores)
    assert (np.diff(scores) <= 1e-6).all()


def test_masked_multilabel_ce():
    # softmax restricted to valid columns; target column certain -> loss ~ 0
    scores = jnp.asarray(
        [[10.0, -10.0, 0.0, -10.0], [0.0, 10.0, -10.0, -10.0]]
    )
    col_mask = jnp.asarray([True, True, True, False])
    target = jnp.asarray([0, 1])
    row_mask = jnp.asarray([True, True])
    loss = masked_multilabel_ce(scores, target, row_mask, col_mask)
    assert float(loss) < 1e-3
    # masked-out rows do not contribute
    loss2 = masked_multilabel_ce(
        scores, jnp.asarray([2, 1]), jnp.asarray([False, True]), col_mask
    )
    assert float(loss2) < 1e-3
