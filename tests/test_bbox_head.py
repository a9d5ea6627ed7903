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
    model = PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)
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
    assert "fc1" in params["params"]["bbox_head"]["relation_layer_0"]["ffn"]  # chunked SwiGLU


def _tiny_bbox_batch(rng, B=2, G=4, Rm=5):
    gt_boxes = np.zeros((B, G, 4), np.float32)
    x0 = rng.uniform(0, 30, (B, G))
    y0 = rng.uniform(0, 30, (B, G))
    gt_boxes[..., 0] = x0
    gt_boxes[..., 1] = y0
    gt_boxes[..., 2] = x0 + rng.uniform(8, 30, (B, G))
    gt_boxes[..., 3] = y0 + rng.uniform(8, 30, (B, G))
    rels = rng.integers(0, G, (B, Rm, 3))
    rels[..., 2] = rng.integers(1, 6, (B, Rm))  # 1-based predicates
    return {
        "gt_labels": jnp.asarray(rng.integers(0, 10, (B, G))),
        "gt_boxes": jnp.asarray(gt_boxes),
        "gt_valid": jnp.asarray(np.array([[1, 1, 1, 0]] * B, bool)),
        "gt_rels": jnp.asarray(rels),
        "rel_valid": jnp.asarray(np.array([[1, 1, 1, 0, 0]] * B, bool)),
        "image_shape": jnp.asarray(np.full((B, 2), 64, np.int32)),
    }


def test_bbox_loss_and_postprocess():
    from pairnet_tpu.models.heads.pairnet_bbox_head import (
        pairnet_bbox_loss,
        pairnet_bbox_postprocess,
    )

    head = CrossHeadBBox(
        num_classes=10, num_relations=5, num_obj_query=16, num_rel_query=12,
        embed_dims=32, num_heads=4, num_encoder_layers=1,
        num_decoder_layers=1, num_relation_layers=1, num_levels=4,
    )
    model = PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    batch = _tiny_bbox_batch(rng)
    # rels referencing the padded gt slot are invalid by construction
    cum = jnp.zeros((5,), jnp.float32)

    def loss_fn(p):
        out = model.apply({**variables, "params": p}, img)
        losses, new_cum = pairnet_bbox_loss(out, batch, None, cum)
        return losses["loss_total"], (losses, new_cum)

    (total, (losses, new_cum)), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_r_cls", "loss_sub_cls", "loss_obj_cls", "loss_match"):
        assert np.isfinite(float(losses[k])), k
    # Seesaw counts were updated from the matched predicates
    assert float(new_cum.sum()) > 0
    # scene-graph branches receive gradient
    g = grads["bbox_head"]["rel_cls_embed"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    g2 = grads["bbox_head"]["sub_query_update"]["layers_0"]["kernel"]
    assert float(jnp.abs(g2).max()) > 0

    out = jax.jit(model.apply)(variables, img)
    pred = pairnet_bbox_postprocess(out, image_index=0)
    K = 12
    assert pred.labels.shape == (2 * K,)
    assert pred.boxes.shape == (2 * K, 4)
    assert pred.r_dists.shape == (K, 6)  # zero bg col prepended
    np.testing.assert_allclose(np.asarray(pred.r_dists[:, 0]), 0.0)
    b = np.asarray(pred.boxes)
    assert (b[:, 2] >= b[:, 0]).all() and (b[:, 3] >= b[:, 1]).all()
    assert int(pred.labels.min()) >= 1  # 1-based


def test_detection_only_loss_finite_and_grads():
    """OD pretraining loss (ref: configs/deformable_detr/od_r101_vg.py):
    per-layer focal + L1 + gIoU over Hungarian-matched queries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pairnet_tpu.models.heads.pairnet_bbox_head import (
        deformable_detr_detection_loss,
    )

    rng = np.random.default_rng(0)
    B, Q, C, G, L = 2, 12, 9, 5, 3
    outputs = {
        "cls_layers": [
            jnp.asarray(rng.normal(size=(B, Q, C)), jnp.float32)
            for _ in range(L)
        ],
        "box_layers": [
            jax.nn.sigmoid(jnp.asarray(rng.normal(size=(B, Q, 4)), jnp.float32))
            for _ in range(L)
        ],
        "enc_cls": jnp.asarray(rng.normal(size=(B, Q, C)), jnp.float32),
        "enc_box": jax.nn.sigmoid(
            jnp.asarray(rng.normal(size=(B, Q, 4)), jnp.float32)
        ),
    }
    xy = rng.uniform(0, 40, size=(B, G, 2))
    wh = rng.uniform(5, 30, size=(B, G, 2))
    batch = {
        "gt_labels": jnp.asarray(rng.integers(0, C, size=(B, G)), jnp.int32),
        "gt_boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32),
        "gt_valid": jnp.asarray(rng.uniform(size=(B, G)) > 0.2),
        "image_shape": jnp.asarray([[64, 80]] * B, jnp.int32),
    }
    losses = jax.jit(
        lambda o, b: deformable_detr_detection_loss(o, b)
    )(outputs, batch)
    assert np.isfinite(float(losses["loss_total"]))
    assert "enc.loss_cls" in losses and "d0.loss_bbox" in losses

    def f(cls0):
        o = dict(outputs)
        o["cls_layers"] = [cls0] + list(outputs["cls_layers"][1:])
        return deformable_detr_detection_loss(o, batch)["loss_total"]

    g = jax.jit(jax.grad(f))(outputs["cls_layers"][0])
    assert float(jnp.abs(g).sum()) > 0
