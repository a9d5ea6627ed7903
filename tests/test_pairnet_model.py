"""End-to-end smoke tests for the Pair-Net model: forward, loss, grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.heads.pairnet_head import PairNetHead
from pairnet_tpu.models.heads.pairnet_loss import pairnet_loss


@pytest.fixture(scope="module")
def tiny_model():
    head = PairNetHead(
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


def _fake_batch(rng, B=2, H=64, W=64, G=6, Rm=8):
    imgs = rng.normal(size=(B, H, W, 3)).astype(np.float32)
    gt_labels = rng.integers(0, 7, size=(B, G)).astype(np.int32)
    gt_masks = (rng.uniform(size=(B, G, H // 4, W // 4)) > 0.7).astype(np.float32)
    gt_valid = np.zeros((B, G), bool)
    gt_valid[:, :4] = True
    gt_rels = np.stack(
        [
            rng.integers(0, 4, size=(B, Rm)),
            rng.integers(0, 4, size=(B, Rm)),
            rng.integers(1, 6, size=(B, Rm)),  # predicates 1-based
        ],
        axis=-1,
    ).astype(np.int32)
    rel_valid = np.zeros((B, Rm), bool)
    rel_valid[:, :5] = True
    return {
        "image": jnp.asarray(imgs),
        "gt_labels": jnp.asarray(gt_labels),
        "gt_masks": jnp.asarray(gt_masks),
        "gt_valid": jnp.asarray(gt_valid),
        "gt_rels": jnp.asarray(gt_rels),
        "rel_valid": jnp.asarray(rel_valid),
    }


@pytest.fixture(scope="module")
def model_fwd(tiny_model):
    """Shared init + forward compile (suite is compile-bound, 1 core)."""
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng)
    params = jax.jit(tiny_model.init)(jax.random.PRNGKey(0), batch["image"])
    out = jax.jit(tiny_model.apply)(params, batch["image"])
    return batch, params, out


def test_forward_shapes(tiny_model, model_fwd):
    batch, params, out = model_fwd
    B, Q, K = 2, 20, 16
    assert out["cls"].shape == (B, Q, 8)
    assert out["rel"].shape == (B, K, 5)
    assert out["importance"].shape == (B, Q, Q)
    assert out["mask"].shape[:2] == (B, Q)
    assert out["sub"].shape == (B, K, 8)
    assert out["sub_pos"].shape == (B, K)
    # top-k pairs must be within query range
    assert (np.asarray(out["sub_pos"]) < Q).all()
    assert (np.asarray(out["obj_pos"]) < Q).all()
    assert np.isfinite(np.asarray(out["cls"])).all()


def test_loss_and_grad(tiny_model, model_fwd):
    batch, params, _out = model_fwd
    cum = jnp.zeros((5,), jnp.float32)

    def loss_fn(p):
        out = tiny_model.apply(p, batch["image"])
        losses, new_cum = pairnet_loss(
            out, batch, jax.random.PRNGKey(42), cum, num_points=256
        )
        return losses["loss_total"], (losses, new_cum)

    (total, (losses, new_cum)), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)

    assert np.isfinite(float(total)), losses
    for k in ("loss_r_cls", "loss_sub_cls", "loss_obj_cls", "loss_match"):
        assert np.isfinite(float(losses[k])), k
    # seesaw counts got updated with matched relations
    assert float(new_cum.sum()) > 0
    # gradient flows to the backbone through the gathered query features
    leaves = jax.tree_util.tree_leaves(grads["params"]["backbone"])
    gnorm = sum(float(jnp.abs(g).sum()) for g in leaves)
    assert gnorm > 0, "no gradient reached the backbone"
    # gradient flows to the relation decoder
    leaves = jax.tree_util.tree_leaves(
        grads["params"]["bbox_head"]["relation_layer_0"]
    )
    assert sum(float(jnp.abs(g).sum()) for g in leaves) > 0


def test_seg_losses_optional(tiny_model, model_fwd):
    batch, params, out = model_fwd
    losses, _ = jax.jit(
        lambda o, b: pairnet_loss(
            o, b, jax.random.PRNGKey(0), jnp.zeros((5,)),
            num_points=128, with_seg_losses=True,
        )
    )(out, batch)
    for k in ("loss_cls", "loss_mask", "loss_dice"):
        assert k in losses and np.isfinite(float(losses[k]))
