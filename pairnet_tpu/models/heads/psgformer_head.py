"""Original PSGFormer head: dual-decoder DETR with prototype matching.

Behavioral counterpart of pairnet/models/relation_heads/
original_psgformer_head.py + frameworks/dual_transformer.py
(config configs/psgformer/psgformer_r50.py): one DETR encoder over C5, two
parallel 6-layer decoders — object queries and relation queries — then:

* object branch: DETR panoptic (class 4.0 CE / box L1 3.0 / gIoU 2.0 /
  MHAttentionMap + MaskHeadSmallConv masks with focal+dice), Hungarian on
  cls/reg/iou costs,
* relation branch: rel CE 2.0 (bg label 0); subjects/objects recovered by
  temperature-scaled (temp=0.1, ref: original_psgformer_head.py:32) cosine
  prototype matching between normalized relation queries and sub/obj MLP
  projections of the object queries (ref: 322-340); trained with
  MultilabelCrossEntropy over matched-query columns (weight 2.0) under an
  IdMatcher assignment on (sub-id, obj-id, predicate) costs.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.heads.baseline_head import masked_multilabel_ce
from pairnet_tpu.models.heads.psgtr_head import (
    DETRDecoderLayer,
    EncoderLayer,
    MaskHeadSmallConv,
    MHAttentionMap,
)
from pairnet_tpu.models.layers import MLP, sine_positional_encoding
from pairnet_tpu.models.matchers import classification_cost
from pairnet_tpu.ops.boxes import cxcywh_to_xyxy, generalized_box_iou
from pairnet_tpu.ops.hungarian import hungarian


class DualTransformer(nn.Module):
    """Shared encoder, two decoders (ref: dual_transformer.py:8-104)."""

    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, tokens, pos, query1, query2):
        mem = tokens
        for i in range(self.num_encoder_layers):
            mem = EncoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                name=f"enc_{i}",
            )(mem, pos)
        B = tokens.shape[0]

        def run_decoder(query_embed, tag):
            x = jnp.zeros((B, query_embed.shape[0], self.embed_dims), tokens.dtype)
            outs = []
            for i in range(self.num_decoder_layers):
                x = DETRDecoderLayer(
                    self.embed_dims, self.num_heads, self.feedforward_channels,
                    name=f"{tag}_{i}",
                )(x, query_embed[None], mem, pos)
                outs.append(x)
            post = nn.LayerNorm(name=f"{tag}_post_norm")
            return [post(o) for o in outs]

        return run_decoder(query1, "dec1"), run_decoder(query2, "dec2"), mem


@HEADS.register()
class PSGFormerHead(nn.Module):
    num_classes: int = 133
    num_relations: int = 56
    num_obj_query: int = 100
    num_rel_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    temp: float = 0.1

    def setup(self):
        C = self.embed_dims
        init = nn.initializers.normal(1.0)
        self.input_proj = nn.Conv(C, (1, 1), name="input_proj")
        self.obj_query_embed = self.param("obj_query_embed", init, (self.num_obj_query, C))
        self.rel_query_embed = self.param("rel_query_embed", init, (self.num_rel_query, C))
        self.transformer = DualTransformer(
            C, self.num_heads, self.num_encoder_layers, self.num_decoder_layers,
            name="transformer",
        )
        self.class_embed = nn.Dense(self.num_classes + 1, name="class_embed")
        self.box_embed = MLP(C, 4, 3, name="box_embed")
        self.sub_query_update = MLP(C, C, 2, name="sub_query_update")
        self.obj_query_update = MLP(C, C, 2, name="obj_query_update")
        # 2-layer classifier like the reference Sequential(Linear, ReLU,
        # Linear) (ref: psgformer_head.py:226-230)
        self.rel_cls_embed = MLP(C, self.num_relations + 1, 2, name="rel_cls_embed")
        self.bbox_attention = MHAttentionMap(C, C, self.num_heads, name="bbox_attention")
        self.mask_head = MaskHeadSmallConv(C + self.num_heads, C, name="mask_head")

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        c5 = feats[-1]
        B, H32, W32, _ = c5.shape
        proj = self.input_proj(c5)
        pos = sine_positional_encoding(H32, W32, self.embed_dims // 2).reshape(
            1, -1, self.embed_dims
        )
        tokens = proj.reshape(B, -1, self.embed_dims)
        obj_outs, rel_outs, memory = self.transformer(
            tokens, pos, self.obj_query_embed, self.rel_query_embed
        )
        obj_last, rel_last = obj_outs[-1], rel_outs[-1]
        Q, K = self.num_obj_query, self.num_rel_query

        cls_layers = [self.class_embed(o) for o in obj_outs]
        box_layers = [jax.nn.sigmoid(self.box_embed(o)) for o in obj_outs]
        cls_pred, box_pred = cls_layers[-1], box_layers[-1]

        mem_map = memory.reshape(B, H32, W32, self.embed_dims)
        attn = self.bbox_attention(obj_last, mem_map)
        x = jnp.concatenate(
            [
                jnp.broadcast_to(proj[:, None], (B, Q, H32, W32, self.embed_dims))
                .reshape(B * Q, H32, W32, self.embed_dims),
                attn.transpose(0, 1, 3, 4, 2).reshape(B * Q, H32, W32, self.num_heads),
            ],
            axis=-1,
        )
        fpn = [jnp.repeat(f, Q, axis=0) for f in (feats[2], feats[1], feats[0])]
        seg = self.mask_head(x, fpn)
        seg_masks = seg.reshape(B, Q, seg.shape[-2], seg.shape[-1])

        def l2n(v):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

        sub_proto = l2n(self.sub_query_update(obj_last))
        obj_proto = l2n(self.obj_query_update(obj_last))
        rel_n = l2n(rel_last)
        subject_scores = jnp.einsum("bkc,bqc->bkq", rel_n, sub_proto) / self.temp
        object_scores = jnp.einsum("bkc,bqc->bkq", rel_n, obj_proto) / self.temp
        sub_ids = subject_scores.argmax(-1)
        obj_ids = object_scores.argmax(-1)

        take = jax.vmap(lambda a, i: jnp.take(a, i, axis=0))
        rel_preds = self.rel_cls_embed(rel_last)

        return {
            "cls": cls_pred,
            "box": box_pred,
            "cls_layers": cls_layers,
            "box_layers": box_layers,
            "mask": seg_masks,
            "rel": rel_preds,
            "subject_scores": subject_scores,
            "object_scores": object_scores,
            "sub": take(cls_pred, sub_ids),
            "obj": take(cls_pred, obj_ids),
            "sub_box": take(box_pred, sub_ids),
            "obj_box": take(box_pred, obj_ids),
            "sub_seg": take(seg_masks, sub_ids),
            "obj_seg": take(seg_masks, obj_ids),
            "sub_pos": sub_ids,
            "obj_pos": obj_ids,
            "queries": obj_last,
        }


def _normalize_boxes(boxes_xyxy, hw):
    h, w = hw[0].astype(jnp.float32), hw[1].astype(jnp.float32)
    scale = jnp.stack([w, h, w, h])
    cxcywh = jnp.stack(
        [
            (boxes_xyxy[:, 0] + boxes_xyxy[:, 2]) / 2,
            (boxes_xyxy[:, 1] + boxes_xyxy[:, 3]) / 2,
            boxes_xyxy[:, 2] - boxes_xyxy[:, 0],
            boxes_xyxy[:, 3] - boxes_xyxy[:, 1],
        ],
        -1,
    )
    return jnp.clip(cxcywh / scale, 0.0, 1.0)


def psgformer_loss(
    outputs,
    batch,
    rng,
    num_classes: int = 133,
    cls_weight: float = 4.0,
    box_l1_weight: float = 3.0,
    giou_weight: float = 2.0,
    rel_weight: float = 2.0,
    id_loss_weight: float = 2.0,
    dice_weight: float = 1.0,
    aux_layers: bool = True,
):
    """PSGFormer losses: DETR object branch + prototype-matching relations."""
    B, Q, Cp1 = outputs["cls"].shape
    G = batch["gt_labels"].shape[1]
    img_hw = batch["image_shape"]

    def obj_match_single(cls_p, box_p, labels, boxes, valid, hw):
        gt_n = _normalize_boxes(boxes, hw)
        factor = jnp.stack([hw[1], hw[0], hw[1], hw[0]]).astype(jnp.float32)
        cost = (
            cls_weight * classification_cost(cls_p, labels)
            + box_l1_weight * jnp.abs(box_p[:, None] - gt_n[None]).sum(-1)
            + giou_weight * -generalized_box_iou(
                cxcywh_to_xyxy(box_p) * factor, boxes
            )
        )
        q2g, g2q = hungarian(cost, col_mask=valid)
        return q2g, g2q, gt_n

    sg = jax.lax.stop_gradient
    losses = {}
    n_layers = len(outputs["cls_layers"])
    layer_ids = range(n_layers) if aux_layers else [n_layers - 1]
    take = jax.vmap(lambda a, i: a[i])

    for li in layer_ids:
        cls_p = outputs["cls_layers"][li]
        box_p = outputs["box_layers"][li]
        q2g, g2q, gt_n = jax.vmap(obj_match_single)(
            sg(cls_p), sg(box_p),
            batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"], img_hw,
        )
        pos = q2g >= 0
        safe = jnp.clip(q2g, 0, G - 1)
        w = pos.astype(jnp.float32)
        npos = jnp.maximum(w.sum(), 1.0)

        lbl_t = jnp.where(pos, take(batch["gt_labels"], safe), num_classes)
        logp = jax.nn.log_softmax(cls_p.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, lbl_t[..., None], -1)[..., 0]
        loss_cls = nll.mean()  # label_weights all ones (ref: 784-786)

        box_t = take(gt_n, safe)
        l1 = jnp.abs(box_p - box_t).sum(-1)
        scale = jnp.concatenate([img_hw[:, ::-1], img_hw[:, ::-1]], -1).astype(
            jnp.float32
        )[:, None]
        diag = jax.vmap(lambda a, b: jnp.diagonal(generalized_box_iou(a, b)))
        g = diag(cxcywh_to_xyxy(box_p) * scale, cxcywh_to_xyxy(box_t) * scale)

        tag = "" if li == n_layers - 1 else f"d{li}."
        losses[f"{tag}loss_cls"] = cls_weight * loss_cls
        losses[f"{tag}loss_bbox"] = box_l1_weight * jnp.sum(l1 * w) / npos
        losses[f"{tag}loss_iou"] = giou_weight * jnp.sum((1.0 - g) * w) / npos

        if li == n_layers - 1:
            # mask dice on matched queries (at gt mask resolution)
            gt_m = take(batch["gt_masks"], safe)
            p = jax.nn.sigmoid(outputs["mask"].astype(jnp.float32))
            p = p.reshape(B, Q, -1)
            t = gt_m.reshape(B, Q, -1)
            num = 2.0 * (p * t).sum(-1)
            den = (p * p).sum(-1) + (t * t).sum(-1)
            dice = 1.0 - (num + 1.0) / (den + 1.0)
            losses["loss_dice"] = dice_weight * jnp.sum(dice * w) / npos

            # relation branch: IdMatcher on prototype scores + predicate
            def rel_single(sub_s, obj_s, rel_s, g2q_i, rels, rv):
                sub_gt = jnp.clip(rels[:, 0], 0, G - 1)
                obj_gt = jnp.clip(rels[:, 1], 0, G - 1)
                ok = rv & (g2q_i[sub_gt] >= 0) & (g2q_i[obj_gt] >= 0)
                gt_sub_q = jnp.where(ok, g2q_i[sub_gt], 0)
                gt_obj_q = jnp.where(ok, g2q_i[obj_gt], 0)
                cost = (
                    classification_cost(sub_s, gt_sub_q)
                    + classification_cost(obj_s, gt_obj_q)
                    + classification_cost(rel_s, rels[:, 2])
                )
                relq2gt, _ = hungarian(cost, col_mask=ok)
                return relq2gt, gt_sub_q, gt_obj_q

            relq2gt, gt_sub_q, gt_obj_q = jax.vmap(rel_single)(
                sg(outputs["subject_scores"]), sg(outputs["object_scores"]),
                sg(outputs["rel"]), g2q, batch["gt_rels"], batch["rel_valid"],
            )
            Rm = batch["gt_rels"].shape[1]
            rpos = relq2gt >= 0
            rsafe = jnp.clip(relq2gt, 0, Rm - 1)
            r_lbl = jnp.where(
                rpos, jnp.take_along_axis(batch["gt_rels"][:, :, 2], rsafe, 1), 0
            )
            R1 = outputs["rel"].shape[-1]
            logp_r = jax.nn.log_softmax(outputs["rel"].astype(jnp.float32), -1)
            nll_r = -jnp.take_along_axis(logp_r, r_lbl[..., None], -1)[..., 0]
            losses["r_loss_cls"] = rel_weight * nll_r.mean()

            sub_tq = jnp.where(rpos, jnp.take_along_axis(gt_sub_q, rsafe, 1), -1)
            obj_tq = jnp.where(rpos, jnp.take_along_axis(gt_obj_q, rsafe, 1), -1)
            q_matched = pos
            lsub = jax.vmap(masked_multilabel_ce)(
                outputs["subject_scores"], sub_tq, rpos, q_matched
            )
            lobj = jax.vmap(masked_multilabel_ce)(
                outputs["object_scores"], obj_tq, rpos, q_matched
            )
            losses["loss_subject_match"] = id_loss_weight * lsub.mean()
            losses["loss_object_match"] = id_loss_weight * lobj.mean()

    losses["loss_total"] = sum(losses.values())
    return losses


def psgformer_postprocess(outputs, image_index=None, num_things: int = 80):
    """Same top-k (query x predicate) protocol as the baseline head
    (ref: original_psgformer_head.py:1002-1100)."""
    from pairnet_tpu.models.heads.baseline_head import baseline_postprocess

    return baseline_postprocess(outputs, image_index, num_things)
