"""CrossHeadBBox (Deformable-DETR Pair-Net) forward smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.pairnet_bbox_head import CrossHeadBBox


def test_forward_shapes_and_refinement():
    head = CrossHeadBBox(
        num_classes=10, num_relations=5, num_obj_query=16, num_rel_query=12,
        embed_dims=32, num_heads=4, num_encoder_layers=2,
        num_decoder_layers=2, num_relation_layers=2, num_levels=4,
    )
    model = PSGTr(backbone=ResNet(depth=50, base_width=8), bbox_head=head)
    img = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(params, img)
    B, Q, K = 2, 16, 12
    assert out["cls"].shape == (B, Q, 10)
    assert out["box"].shape == (B, Q, 4)
    assert out["rel"].shape == (B, K, 5)
    assert out["importance"].shape == (B, Q, Q)
    assert len(out["cls_layers"]) == 2
    b = np.asarray(out["box"])
    assert (b >= 0).all() and (b <= 1).all()  # normalized cxcywh
    assert np.isfinite(np.asarray(out["rel"])).all()
    # RMSNorm relation decoder params exist
    assert "relation_layer_0" in params["params"]["bbox_head"]
    assert "w1" in params["params"]["bbox_head"]["relation_layer_0"]["ffn"]
