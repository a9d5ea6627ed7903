"""detr4seg (seg-only DETR) forward/loss/postprocess."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.detr4seg_head import (
    Detr4SegHead,
    detr4seg_loss,
    detr4seg_postprocess,
)


def _batch(rng, B=2, G=4):
    boxes = np.zeros((B, G, 4), np.float32)
    x0 = rng.uniform(0, 30, (B, G)); y0 = rng.uniform(0, 30, (B, G))
    boxes[..., 0] = x0; boxes[..., 1] = y0
    boxes[..., 2] = x0 + rng.uniform(8, 30, (B, G))
    boxes[..., 3] = y0 + rng.uniform(8, 30, (B, G))
    masks = np.zeros((B, G, 16, 16), np.float32)
    masks[:, :, 2:10, 2:10] = 1.0
    return {
        "gt_labels": jnp.asarray(rng.integers(0, 7, (B, G))),
        "gt_boxes": jnp.asarray(boxes),
        "gt_masks": jnp.asarray(masks),
        "gt_valid": jnp.asarray(np.array([[1, 1, 1, 0]] * B, bool)),
        "image_shape": jnp.asarray(np.full((B, 2), 64, np.int32)),
    }


def test_detr4seg_forward_loss_postprocess():
    head = Detr4SegHead(
        num_classes=7, num_query=10, embed_dims=32, num_heads=4,
        num_encoder_layers=1, num_decoder_layers=2,
    )
    model = PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img)
    out = jax.jit(model.apply)(variables, img)
    assert out["cls"].shape == (2, 10, 8)
    assert out["box"].shape == (2, 10, 4)
    assert out["mask"].shape[:2] == (2, 10)

    batch = _batch(rng)

    def loss_fn(p):
        o = model.apply({**variables, "params": p}, img)
        losses = detr4seg_loss(o, batch, jax.random.PRNGKey(1), num_points=64)
        return losses["loss_total"], losses

    (total, losses), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p)
    )(variables["params"])
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_bbox", "loss_iou", "loss_focal", "loss_dice",
              "d0.loss_cls"):
        assert k in losses and np.isfinite(float(losses[k])), k
    g = grads["bbox_head"]["mask_head"]["out_lay"]["kernel"]
    assert float(jnp.abs(g).max()) > 0
    g = grads["bbox_head"]["box_embed"]["layers_0"]["kernel"]
    assert float(jnp.abs(g).max()) > 0

    pred = jax.jit(
        lambda o: detr4seg_postprocess(o, image_index=0, num_things=4)
    )(out)
    assert pred.pan_seg.shape == out["mask"].shape[-2:]
    assert pred.labels.shape == (20,)
