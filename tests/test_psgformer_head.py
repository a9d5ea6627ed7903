"""PSGFormer head: forward, loss, postprocess smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.psgformer_head import (
    PSGFormerHead,
    psgformer_loss,
    psgformer_postprocess,
)
from tests.test_psgtr_head import _batch_with_boxes


@pytest.fixture(scope="module")
def tiny_psgformer():
    head = PSGFormerHead(
        num_classes=7,
        num_relations=5,
        num_obj_query=12,
        num_rel_query=12,
        embed_dims=32,
        num_heads=4,
        num_encoder_layers=2,
        num_decoder_layers=2,
    )
    return PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)


@pytest.fixture(scope="module")
def psgformer_fwd(tiny_psgformer):
    """Shared init + forward compile (suite is compile-bound, 1 core)."""
    rng = np.random.default_rng(0)
    batch = _batch_with_boxes(rng)
    params = jax.jit(tiny_psgformer.init)(jax.random.PRNGKey(0), batch["image"])
    out = jax.jit(tiny_psgformer.apply)(params, batch["image"])
    return batch, params, out


def test_forward_shapes(tiny_psgformer, psgformer_fwd):
    batch, params, out = psgformer_fwd
    B, Q, K = 2, 12, 12
    assert out["cls"].shape == (B, Q, 8)
    assert out["rel"].shape == (B, K, 6)
    assert out["subject_scores"].shape == (B, K, Q)
    assert out["mask"].shape == (B, Q, 16, 16)
    assert out["sub_seg"].shape == (B, K, 16, 16)
    # dual decoders: object and relation paths differ
    assert not np.allclose(np.asarray(out["cls"]), np.asarray(out["sub"]))


def test_loss_and_grad(tiny_psgformer, psgformer_fwd):
    batch, params, _out = psgformer_fwd

    def loss_fn(p):
        out = tiny_psgformer.apply(p, batch["image"])
        losses = psgformer_loss(out, batch, jax.random.PRNGKey(3), num_classes=7)
        return losses["loss_total"], losses

    (total, losses), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    for k in (
        "loss_cls", "loss_bbox", "loss_iou", "loss_dice",
        "r_loss_cls", "loss_subject_match", "loss_object_match", "d0.loss_cls",
    ):
        assert k in losses and np.isfinite(float(losses[k])), k
    gn = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["params"]["backbone"])
    )
    assert gn > 0


def test_postprocess(tiny_psgformer, psgformer_fwd):
    batch, params, out = psgformer_fwd
    pred = jax.jit(lambda o: psgformer_postprocess(o, 0, num_things=4))(
        {k: v for k, v in out.items() if not isinstance(v, list)}
    )
    K = 12
    assert pred.r_dists.shape == (K, 6)
    assert pred.masks.shape[0] == 2 * K
