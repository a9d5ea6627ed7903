"""detr4seg: DETR panoptic-segmentation head (no relations).

Behavioral counterpart of pairnet/models/relation_heads/detr4seg_head.py
(1138 lines; framework pairnet/models/frameworks/detr4seg.py:37-53) — the
seg-only DETR used to pretrain and evaluate segmenters:

* DETR transformer over the C5 map, per-layer class (C+1 softmax) and box
  (sigmoid cxcywh) heads (ref: detr4seg_head.py:269-320),
* MHAttentionMap + MaskHeadSmallConv mask branch on the final decoder layer
  (vendored modules at detr4seg_head.py:974-1123 — shared with PSGTr here),
* Hungarian assignment on cls 1 / L1 5 / gIoU 2 costs; losses: per-layer
  CE (bg weight 0.1) + L1 + gIoU, plus mask BCE-focal 1 + dice 1 on the
  final layer (ref: detr4seg_head.py:185-265, 408-520),
* inference: DETR panoptic fusion (softmax-argmax over queries) — reuse
  :func:`pairnet_tpu.models.heads.diagnostic.diagnostic_postprocess`.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.heads.psgtr_head import (
    DETRTransformer,
    MaskHeadSmallConv,
    MHAttentionMap,
)
from pairnet_tpu.models.layers import MLP, sine_positional_encoding
from pairnet_tpu.models.losses import naive_dice_loss, sigmoid_bce
from pairnet_tpu.models.matchers import classification_cost
from pairnet_tpu.ops.boxes import cxcywh_to_xyxy, generalized_box_iou
from pairnet_tpu.ops.hungarian import hungarian
from pairnet_tpu.ops.sampling import sample_mask_points


@HEADS.register()
class Detr4SegHead(nn.Module):
    num_classes: int = 133
    num_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6

    def setup(self):
        C = self.embed_dims
        self.input_proj = nn.Conv(C, (1, 1), name="input_proj")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_query, C)
        )
        self.transformer = DETRTransformer(
            C, self.num_heads, self.num_encoder_layers, self.num_decoder_layers,
            name="transformer",
        )
        self.class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        self.box_embed = MLP(C, 4, 3, name="box_embed")
        self.bbox_attention = MHAttentionMap(
            C, C, self.num_heads, name="bbox_attention"
        )
        self.mask_head = MaskHeadSmallConv(
            C + self.num_heads, C, name="mask_head"
        )

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        c5 = feats[-1]
        B, H32, W32, _ = c5.shape
        proj = self.input_proj(c5)
        pos = sine_positional_encoding(H32, W32, self.embed_dims // 2)
        outs, memory = self.transformer(
            proj.reshape(B, -1, self.embed_dims),
            pos.reshape(1, -1, self.embed_dims),
            self.query_embed,
        )
        cls_layers = [self.class_embed(o) for o in outs]
        box_layers = [jax.nn.sigmoid(self.box_embed(o)) for o in outs]

        mem_map = memory.reshape(B, H32, W32, self.embed_dims)
        attn = self.bbox_attention(outs[-1], mem_map)  # (B, Q, h, H32, W32)
        Q = self.num_query
        fpn = [feats[2], feats[1], feats[0]]
        x = jnp.concatenate(
            [
                jnp.broadcast_to(
                    proj[:, None], (B, Q, H32, W32, self.embed_dims)
                ).reshape(B * Q, H32, W32, self.embed_dims),
                attn.transpose(0, 1, 3, 4, 2).reshape(
                    B * Q, H32, W32, self.num_heads
                ),
            ],
            axis=-1,
        )
        fpn_rep = [jnp.repeat(f, Q, axis=0) for f in fpn]
        m = self.mask_head(x, fpn_rep)
        mask = m.reshape(B, Q, m.shape[-2], m.shape[-1])

        return {
            "cls": cls_layers[-1],
            "box": box_layers[-1],
            "mask": mask,
            "layers": {"cls": cls_layers, "box": box_layers},
        }


def detr4seg_loss(
    outputs,
    batch,
    rng,
    num_classes: int = 133,
    bg_cls_weight: float = 0.1,
    box_l1_weight: float = 5.0,
    giou_weight: float = 2.0,
    focal_weight: float = 1.0,
    dice_weight: float = 1.0,
    num_points: int = 2048,
    aux_layers: bool = True,
):
    """Per-layer detection losses + final-layer mask losses.

    batch: gt_labels/gt_boxes(xyxy px)/gt_masks/gt_valid/image_shape.
    """
    B = outputs["cls"].shape[0]
    G = batch["gt_labels"].shape[1]
    img_hw = batch["image_shape"]
    points = jax.random.uniform(rng, (B, num_points, 2))
    sg = jax.lax.stop_gradient

    def norm_boxes(boxes, hw):
        scale = jnp.concatenate([hw[::-1], hw[::-1]]).astype(jnp.float32)
        b = boxes / jnp.maximum(scale, 1.0)
        return jnp.clip(
            jnp.stack(
                [
                    (b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2,
                    b[:, 2] - b[:, 0], b[:, 3] - b[:, 1],
                ],
                -1,
            ),
            0.0, 1.0,
        )

    def match_single(cls, box, labels, boxes, valid, hw):
        gt_n = norm_boxes(boxes, hw)
        cost = classification_cost(cls, labels)
        cost = cost + box_l1_weight * jnp.abs(box[:, None] - gt_n[None]).sum(-1)
        scale = jnp.concatenate([hw[::-1], hw[::-1]]).astype(jnp.float32)
        giou = generalized_box_iou(
            cxcywh_to_xyxy(box) * scale, cxcywh_to_xyxy(gt_n) * scale
        )
        cost = cost + giou_weight * (-giou)
        q2g, _ = hungarian(cost, col_mask=valid)
        return q2g, gt_n

    def layer_loss(cls_pred, box_pred):
        q2g, gt_n = jax.vmap(match_single)(
            sg(cls_pred), sg(box_pred),
            batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"],
            img_hw.astype(jnp.float32),
        )
        pos = q2g >= 0
        safe = jnp.clip(q2g, 0, G - 1)
        take = jax.vmap(lambda a, i: a[i])
        w = pos.astype(jnp.float32)
        npos = jnp.maximum(w.sum(), 1.0)
        Cn = cls_pred.shape[-1]
        cls_t = jnp.where(pos, take(batch["gt_labels"], safe), Cn - 1)
        cw = jnp.ones(Cn).at[Cn - 1].set(bg_cls_weight)
        logp = jax.nn.log_softmax(cls_pred.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, cls_t[..., None], -1)[..., 0]
        loss_cls = jnp.sum(nll * cw[cls_t]) / jnp.maximum(
            npos + bg_cls_weight * (w.size - w.sum()), 1.0
        )
        box_t = take(gt_n, safe)
        loss_bbox = box_l1_weight * jnp.sum(
            jnp.abs(box_pred - box_t).sum(-1) * w
        ) / npos
        scale = jnp.concatenate(
            [img_hw[:, ::-1], img_hw[:, ::-1]], -1
        ).astype(jnp.float32)[:, None]
        # giou of each query against ITS matched target
        gi = jax.vmap(
            lambda bp, bt, s: jnp.diagonal(
                generalized_box_iou(cxcywh_to_xyxy(bp) * s, cxcywh_to_xyxy(bt) * s)
            )
        )(box_pred, box_t, scale[:, 0])
        loss_iou = giou_weight * jnp.sum((1.0 - gi) * w) / npos
        return loss_cls, loss_bbox, loss_iou, q2g, pos, safe

    cls_layers = outputs["layers"]["cls"] if aux_layers else [outputs["cls"]]
    box_layers = outputs["layers"]["box"] if aux_layers else [outputs["box"]]
    losses = {}
    for li, (c, bx) in enumerate(zip(cls_layers, box_layers)):
        lc, lb, lg, q2g, pos, safe = layer_loss(c, bx)
        tag = "" if li == len(cls_layers) - 1 else f"d{li}."
        losses[f"{tag}loss_cls"] = lc
        losses[f"{tag}loss_bbox"] = lb
        losses[f"{tag}loss_iou"] = lg

    # final-layer mask losses on sampled points
    take = jax.vmap(lambda a, i: a[i])
    pred_pts = jax.vmap(sample_mask_points)(outputs["mask"], points)
    gt_pts = jax.vmap(sample_mask_points)(
        batch["gt_masks"].astype(jnp.float32), points
    )
    gt_for_q = take(gt_pts, safe)
    wq = pos.astype(jnp.float32).reshape(-1)
    npos = jnp.maximum(wq.sum(), 1.0)
    P = pred_pts.shape[-1]
    losses["loss_focal"] = focal_weight * jnp.sum(
        sigmoid_bce(pred_pts, (gt_for_q > 0.5).astype(jnp.float32))
        .mean(-1).reshape(-1) * wq
    ) / npos
    losses["loss_dice"] = dice_weight * naive_dice_loss(
        pred_pts.reshape(-1, P),
        (gt_for_q > 0.5).astype(jnp.float32).reshape(-1, P),
        wq,
    )
    losses["loss_total"] = sum(losses.values())
    return losses


def detr4seg_postprocess(outputs, image_index=None, num_things: int = 80):
    """DETR panoptic fusion over the query set (no relations)."""
    from pairnet_tpu.models.heads.diagnostic import diagnostic_postprocess

    return diagnostic_postprocess(
        outputs, image_index=image_index, num_things=num_things,
        num_relations=1, score_thr=0.85,
    )
