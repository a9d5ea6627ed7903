"""PSGTr2 head + CrossHeadDirect ablation smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.pairnet_head import PairNetHead
from pairnet_tpu.models.heads.pairnet_loss import pairnet_loss
from pairnet_tpu.models.heads.psgtr2_head import PSGTr2Head, psgtr2_loss
from tests.test_pairnet_model import _fake_batch


def test_psgtr2_forward_and_loss():
    head = PSGTr2Head(
        num_classes=7, num_relations=5, num_query=12, embed_dims=32,
        num_heads=4, num_decoder_layers=3, pixel_decoder_layers=1,
    )
    model = PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])

    def loss_fn(p):
        out = model.apply(p, batch["image"])
        losses = psgtr2_loss(
            out, batch, jax.random.PRNGKey(1), num_classes=7, num_points=128
        )
        return losses["loss_total"], (out, losses)

    (total, (out, losses)), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(params)
    assert out["sub"].shape == (2, 12, 8)
    assert out["rel"].shape == (2, 12, 6)
    assert out["sub_seg"].shape[:2] == (2, 12)
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    for k in ("s_loss_mask", "o_loss_dice", "r_loss_cls"):
        assert k in losses
    g = jax.tree_util.tree_leaves(grads["params"]["backbone"])
    assert sum(float(jnp.abs(x).sum()) for x in g) > 0


def test_crosshead_direct():
    head = PairNetHead(
        num_classes=7, num_relations=5, num_obj_query=20, num_rel_query=16,
        embed_dims=32, num_heads=4, num_decoder_layers=3,
        num_relation_layers=2, pixel_decoder_layers=1, direct=True,
    )
    model = PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)
    rng = np.random.default_rng(1)
    batch = _fake_batch(rng)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch["image"])
    # no relation decoder params in the direct variant
    assert "pair_embed" in params["params"]["bbox_head"]
    out = jax.jit(model.apply)(params, batch["image"])
    assert out["rel"].shape == (2, 16, 5)
    losses, _ = pairnet_loss(
        out, batch, jax.random.PRNGKey(2), jnp.zeros((5,)), num_points=128
    )
    assert np.isfinite(float(losses["loss_total"]))
