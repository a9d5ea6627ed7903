"""Pair-Net on Deformable-DETR boxes (VG / OIV6), a.k.a. CrossHeadBBox.

Behavioral counterpart of pairnet/models/relation_heads/pairnet_bbox_head.py
(config configs/deformable_detr/pairnet_r101_vg.py): a two-stage
Deformable-DETR detector (ChannelMapper neck over C3-C5 + extra level,
6-layer deformable encoder, encoder-proposal query init, 6-layer decoder
with iterative box refinement) plus the Pair-Net machinery on the decoder
queries — sub/obj MLPs, L2-normalized affinity, Matrix Learner, top-k pair
selection, and a Relation Fusion decoder whose norms are RMSNorm and whose
FFN is SwiGLU (ref: pairnet/models/frameworks/fc.py:7-26 registrations,
config lines 86-110).

Boxes are normalized cxcywh; per-layer class/box heads share DETR semantics
(sigmoid classification, inverse-sigmoid reference refinement).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS, MODELS
from pairnet_tpu.models.heads.matrix_learner import create_mapper
from pairnet_tpu.models.layers import (
    MLP,
    MSDeformAttention,
    MultiheadAttention,
    RMSNorm,
    SwiGLU,
    encoder_reference_points,
    sine_positional_encoding,
)
from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x) - jnp.log1p(-x)


class ChannelMapper(nn.Module):
    """1x1 conv + GN per level, plus extra stride-2 levels (mmdet ChannelMapper)."""

    out_channels: int = 256
    num_outs: int = 4

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        outs = []
        for i, f in enumerate(feats):
            x = nn.Conv(self.out_channels, (1, 1), name=f"conv_{i}")(f)
            outs.append(nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"gn_{i}")(x))
        i = len(feats)
        while len(outs) < self.num_outs:
            # mmdet ChannelMapper: the FIRST extra conv consumes the raw last
            # backbone level; subsequent extras chain on the previous extra
            src = feats[-1] if len(outs) == len(feats) else outs[-1]
            x = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], name=f"extra_conv_{i}",
            )(src)
            outs.append(nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"extra_gn_{i}")(x))
            i += 1
        return tuple(outs)


class DeformableDecoderLayer(nn.Module):
    """self_attn -> norm -> deformable cross_attn -> norm -> ffn -> norm."""

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    feedforward_channels: int = 1024

    @nn.compact
    def __call__(self, q, qpos, memory, ref_points, spatial_shapes):
        x = q + MultiheadAttention(self.embed_dims, self.num_heads, name="self_attn")(
            q + qpos, q + qpos, q
        )
        x = nn.LayerNorm(name="norm1")(x)
        x = MSDeformAttention(
            self.embed_dims, self.num_heads, self.num_levels, self.num_points,
            name="cross_attn",
        )(x, memory, ref_points, spatial_shapes, query_pos=qpos)
        x = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.feedforward_channels, name="ffn_fc1")(x)
        y = nn.Dense(self.embed_dims, name="ffn_fc2")(nn.relu(y))
        return nn.LayerNorm(name="norm3")(x + y)


class ChunkSwiGLU(nn.Module):
    """mmcv-FFN-with-SwiGLU-activation semantics (ref: frameworks/fc.py:22-26
    + config ffn_cfgs act_cfg=SwiGLU): one fused projection to
    ``feedforward_channels`` whose output chunks into (x, gate) halves,
    silu(gate) * x, then the output projection. Weight layout matches the
    reference FFN state dict (layers.0.0 / layers.1)."""

    feedforward_channels: int = 2048
    out_dim: int = 256

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.feedforward_channels, name="fc1")(x)
        a, gate = jnp.split(y, 2, axis=-1)
        return nn.Dense(self.out_dim, name="fc2")(nn.silu(gate) * a)


class RelationFusionLayerRMS(nn.Module):
    """Relation decoder layer with RMSNorm + chunked-SwiGLU FFN (VG variant).

    PRE-norm with no trailing norm, per the reference operation_order
    ("norm", "cross_attn", "norm", "self_attn", "norm", "ffn") —
    ref: configs/deformable_detr/pairnet_r101_vg.py:91-119; the head loops
    relation_decoder.layers directly so no decoder post-norm applies
    (ref: pairnet_bbox_head.py:307-318). The value_pos table exists in the
    reference but mmcv MultiheadAttention ignores value_pos, so values stay
    raw here too.
    """

    embed_dims: int = 256
    num_heads: int = 8
    ffn_hidden: int = 2048

    @nn.compact
    def __call__(self, q, qpos, memory, key_pos):
        n1 = RMSNorm(self.embed_dims, name="norm1")(q)
        x = q + MultiheadAttention(self.embed_dims, self.num_heads, name="cross_attn")(
            n1 + qpos, memory + key_pos, memory
        )
        n2 = RMSNorm(self.embed_dims, name="norm2")(x)
        x = x + MultiheadAttention(self.embed_dims, self.num_heads, name="self_attn")(
            n2 + qpos, n2 + qpos, n2
        )
        n3 = RMSNorm(self.embed_dims, name="norm3")(x)
        return x + ChunkSwiGLU(self.ffn_hidden, self.embed_dims, name="ffn")(n3)


@HEADS.register()
class CrossHeadBBox(nn.Module):
    num_classes: int = 150
    num_relations: int = 50
    num_obj_query: int = 100
    num_rel_query: int = 100
    mapper: str = "conv_tiny"
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    num_relation_layers: int = 6
    num_levels: int = 4
    with_box_refine: bool = True
    as_two_stage: bool = True
    ffn_channels: int = 1024
    relation_ffn_channels: int = 2048

    def setup(self):
        C = self.embed_dims
        init = nn.initializers.normal(1.0)
        self.neck = ChannelMapper(C, self.num_levels, name="neck")
        self.encoder_layers = [
            DeformableEncoderLayer(
                C, self.num_heads, self.num_levels, 4, self.ffn_channels,
                name=f"enc_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DeformableDecoderLayer(
                C, self.num_heads, self.num_levels, 4, self.ffn_channels,
                name=f"dec_{i}",
            )
            for i in range(self.num_decoder_layers)
        ]
        self.level_embed = self.param("level_embed", init, (self.num_levels, C))
        # two-stage proposal heads on the encoder memory (mmdet
        # DeformableDetrTransformer: enc_output + norm, then the extra
        # (num_dec+1)-th cls/reg branch scores the proposals)
        self.enc_output = nn.Dense(C, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(name="enc_output_norm")
        self.enc_cls = nn.Dense(self.num_classes, name="enc_cls")
        self.enc_box = MLP(C, 4, 3, name="enc_box")
        self.pos_trans = nn.Dense(2 * C, name="pos_trans")
        self.pos_trans_norm = nn.LayerNorm(name="pos_trans_norm")
        # per-layer prediction heads (cloned per layer, DETR style)
        self.cls_branches = [
            nn.Dense(self.num_classes, name=f"cls_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.reg_branches = [
            MLP(C, 4, 3, name=f"reg_{i}") for i in range(self.num_decoder_layers)
        ]
        # Pair Proposal Network + Relation Fusion (RMSNorm/SwiGLU variant)
        K = self.num_rel_query
        self.sub_query_update = MLP(C, C, 3, name="sub_query_update")
        self.obj_query_update = MLP(C, C, 3, name="obj_query_update")
        self.update_importance = create_mapper(self.mapper)
        self.rel_query_feat = self.param("rel_query_feat", init, (K, C))
        self.rel_query_pos_embed = self.param("rel_query_pos_embed", init, (K, C))
        self.rel_key_pos_embed = self.param("rel_key_pos_embed", init, (2 * K, C))
        self.rel_value_pos_embed = self.param("rel_value_pos_embed", init, (2 * K, C))
        self.rel_cls_embed = nn.Dense(self.num_relations, name="rel_cls_embed")
        self.relation_layers = [
            RelationFusionLayerRMS(
                C, self.num_heads, self.relation_ffn_channels,
                name=f"relation_layer_{i}",
            )
            for i in range(self.num_relation_layers)
        ]

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        """feats: backbone (C2, C3, C4, C5); uses C3-C5 + extra level."""
        levels = self.neck(feats[1:])
        B = levels[0].shape[0]
        C = self.embed_dims
        shapes = [(f.shape[1], f.shape[2]) for f in levels]
        tokens = jnp.concatenate(
            [
                f.reshape(B, -1, C) + self.level_embed[i]
                for i, f in enumerate(levels)
            ],
            axis=1,
        )
        pos = jnp.concatenate(
            [
                jnp.broadcast_to(
                    sine_positional_encoding(h, w, C // 2).reshape(1, h * w, C),
                    (B, h * w, C),
                )
                for (h, w) in shapes
            ],
            axis=1,
        )
        ref = encoder_reference_points(shapes)
        ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
        mem = tokens
        for layer in self.encoder_layers:
            mem = layer(mem, pos, ref, shapes)

        Q = self.num_obj_query
        take = jax.vmap(lambda a, i: a[i])
        # two-stage: encoder proposals -> top-k query init (mmdet
        # gen_encoder_output_proposals semantics: per-level grid centers with
        # wh = 0.05 * 2^lvl in logit space; enc_output + LN on the memory;
        # top-k ranked by the FIRST class logit)
        props = []
        for lvl, (h, w) in enumerate(shapes):
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            wh = jnp.full((h, w, 2), 0.05 * (2.0 ** lvl))
            props.append(
                jnp.concatenate(
                    [xx[..., None], yy[..., None], wh], -1
                ).reshape(h * w, 4)
            )
        proposals = jnp.concatenate(props, 0)[None]  # (1, S, 4) in (0,1)
        proposals_unact = inverse_sigmoid(proposals)
        out_mem = self.enc_output_norm(self.enc_output(mem))
        enc_logits = self.enc_cls(out_mem)  # (B, S, C_cls)
        enc_unact = self.enc_box(out_mem) + proposals_unact
        enc_boxes = jax.nn.sigmoid(enc_unact)  # (B, S, 4) cxcywh
        _, topk = jax.lax.top_k(enc_logits[..., 0], Q)
        topk_unact = jax.lax.stop_gradient(take(enc_unact, topk))  # (B, Q, 4)
        ref_boxes = jax.nn.sigmoid(topk_unact)
        # get_proposal_pos_embed: 128-feat sine embedding of the 4 coords
        scale = 2.0 * 3.141592653589793
        dim_t = jnp.arange(128, dtype=jnp.float32)
        dim_t = 10000.0 ** (2.0 * (dim_t // 2) / 128.0)
        pe = ref_boxes[..., None] * scale / dim_t  # (B, Q, 4, 128)
        pe = jnp.stack(
            [jnp.sin(pe[..., 0::2]), jnp.cos(pe[..., 1::2])], -1
        ).reshape(B, Q, 4 * 128)
        pos_feat = self.pos_trans_norm(self.pos_trans(pe.astype(mem.dtype)))
        qpos, q = jnp.split(pos_feat, 2, axis=-1)

        cls_layers, box_layers = [], []
        for i, layer in enumerate(self.decoder_layers):
            # deformable cross-attn on 4-dim box references (mmcv MSDA:
            # loc = cxcy + offset / P * wh * 0.5)
            ref_pts = jnp.broadcast_to(
                ref_boxes[:, :, None, :], (B, Q, self.num_levels, 4)
            )
            q = layer(q, qpos, mem, ref_pts, shapes)
            cls_layers.append(self.cls_branches[i](q))
            delta = self.reg_branches[i](q)
            new_boxes = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))
            box_layers.append(new_boxes)
            if self.with_box_refine:
                ref_boxes = jax.lax.stop_gradient(new_boxes)

        # rank the final queries by class confidence and reorder everything
        # (ref: pairnet_bbox_head.py:250-268 — softmax over the QUERY axis,
        # max over classes, topk = a permutation of all Q queries; the PPN
        # runs on DETACHED reordered features)
        q_scores = jax.nn.softmax(
            cls_layers[-1].astype(jnp.float32), axis=1
        ).max(-1)
        _, order = jax.lax.top_k(q_scores, Q)
        cls_layers[-1] = take(cls_layers[-1], order)
        box_layers[-1] = take(box_layers[-1], order)
        queries = jax.lax.stop_gradient(take(q, order))  # (B, Q, C)
        # --- PPN ---
        l2n = lambda v: v / jnp.maximum(
            jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12
        )
        sub_e = l2n(self.sub_query_update(queries))
        obj_e = l2n(self.obj_query_update(queries))
        importance = self.update_importance(
            jnp.einsum("bqc,bkc->bqk", sub_e, obj_e,
                       preferred_element_type=jnp.float32)
        )
        K = self.num_rel_query
        _, topk_idx = jax.lax.top_k(importance.reshape(B, Q * Q), K)
        sub_pos = topk_idx // Q
        obj_pos = topk_idx % Q
        sub_feat = take(queries, sub_pos)
        obj_feat = take(queries, obj_pos)
        pair_feat = jnp.concatenate([sub_feat, obj_feat], axis=1)

        rel_q = jnp.broadcast_to(self.rel_query_feat[None], (B, K, C))
        for layer in self.relation_layers:
            rel_q = layer(
                rel_q, self.rel_query_pos_embed[None], pair_feat,
                self.rel_key_pos_embed[None],
            )
        rel_preds = self.rel_cls_embed(rel_q)

        # sub/obj class logits gathered WITHOUT detach: the subobj CE is what
        # trains the decoder/cls branches in the reference (detection losses
        # are commented out there; only the PPN input features are detached,
        # ref: pairnet_bbox_head.py:261 hs.clone().detach())
        return {
            "cls": cls_layers[-1],  # (B, Q, C_cls) sigmoid-style logits
            "box": box_layers[-1],
            "cls_layers": cls_layers,
            "box_layers": box_layers,
            "enc_cls": enc_logits,
            "enc_box": enc_boxes,
            "rel": rel_preds,
            "importance": importance,
            "sub": take(cls_layers[-1], sub_pos),
            "obj": take(cls_layers[-1], obj_pos),
            "sub_box": take(box_layers[-1], sub_pos),
            "obj_box": take(box_layers[-1], obj_pos),
            "sub_pos": sub_pos,
            "obj_pos": obj_pos,
            "queries": queries,
        }


# ---------------------------------------------------------------------------
# Training losses (behavioral counterpart of CrossHeadBBox.loss /
# _get_target_single, ref: pairnet/models/relation_heads/pairnet_bbox_head.py:
# 362-693: the detection losses are built but commented out in the reference;
# only the scene-graph losses train — rel Seesaw 2.0, sub/obj CE 4.0,
# importance BCE 5.0 with dynamic pos_weight, with query<->GT correspondence
# established by the box HungarianAssigner, batched/vmapped here).
# ---------------------------------------------------------------------------


def _bbox_targets_single(
    cls_pred,  # (Q, C) sigmoid logits
    box_pred,  # (Q, 4) normalized cxcywh
    sub_score,  # (K, C) detached gathered logits
    obj_score,  # (K, C)
    rel_score,  # (K, R)
    gt_labels,  # (G,) 0-based
    gt_boxes,  # (G, 4) xyxy in resized-image pixels
    gt_valid,  # (G,) bool
    gt_rels,  # (Rm, 3) [sub_gt, obj_gt, predicate_1based]
    rel_valid,  # (Rm,) bool
    img_hw,  # (2,)
):
    from pairnet_tpu.models.matchers import box_hungarian_assign, id_match

    Q = cls_pred.shape[0]
    G = gt_labels.shape[0]
    Rm = gt_rels.shape[0]
    scale = jnp.concatenate([img_hw[::-1], img_hw[::-1]]).astype(jnp.float32)
    gt_xyxy_n = gt_boxes / jnp.maximum(scale, 1.0)
    gt_cxcywh = jnp.clip(
        jnp.stack(
            [
                (gt_xyxy_n[:, 0] + gt_xyxy_n[:, 2]) / 2,
                (gt_xyxy_n[:, 1] + gt_xyxy_n[:, 3]) / 2,
                gt_xyxy_n[:, 2] - gt_xyxy_n[:, 0],
                gt_xyxy_n[:, 3] - gt_xyxy_n[:, 1],
            ],
            -1,
        ),
        0.0, 1.0,
    )
    assign = box_hungarian_assign(
        cls_pred, box_pred, gt_labels, gt_cxcywh, gt_valid, img_hw
    )
    gt2query = assign.gt2query  # (G,)

    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    rel_ok = rel_valid & (gt2query[sub_gt] >= 0) & (gt2query[obj_gt] >= 0)
    gt_sub_q = jnp.where(rel_ok, gt2query[sub_gt], Q)
    gt_obj_q = jnp.where(rel_ok, gt2query[obj_gt], Q)
    gt_importance = (
        jnp.zeros((Q, Q), jnp.float32).at[gt_sub_q, gt_obj_q].max(1.0, mode="drop")
    )

    gt_sub_cls = gt_labels[sub_gt]
    gt_obj_cls = gt_labels[obj_gt]
    gt_rel_label = gt_rels[:, 2] - 1
    idres = id_match(
        sub_score, obj_score, rel_score,
        gt_sub_cls, gt_obj_cls, gt_rel_label, rel_ok,
    )
    matched = idres.relq2gt  # (K,)
    safe = jnp.clip(matched, 0, Rm - 1)
    pos = matched >= 0
    r_labels = jnp.where(pos, gt_rel_label[safe], -1)
    sub_ids = jnp.where(pos, gt_sub_cls[safe], -1)
    obj_ids = jnp.where(pos, gt_obj_cls[safe], -1)
    return r_labels, pos.astype(jnp.float32), sub_ids, obj_ids, gt_importance


def deformable_detr_detection_loss(
    outputs,
    batch,
    cls_weight: float = 2.0,
    l1_weight: float = 5.0,
    giou_weight: float = 2.0,
    focal_alpha: float = 0.25,
    focal_gamma: float = 2.0,
):
    """Detection-only pretraining loss — counterpart of the reference's
    od_r101_vg.py run (ref: configs/deformable_detr/od_r101_vg.py: mmdet
    DeformableDETRHead loss): per-decoder-layer sigmoid focal cls + L1 +
    gIoU on Hungarian-matched queries, plus the encoder-proposal losses.
    """
    from pairnet_tpu.models.matchers import box_hungarian_assign
    from pairnet_tpu.ops.boxes import cxcywh_to_xyxy, generalized_box_iou

    img_hw = batch["image_shape"].astype(jnp.float32)
    gt_labels = batch["gt_labels"]
    gt_valid = batch["gt_valid"]
    B, G = gt_labels.shape

    def to_cxcywh_norm(gt_boxes, hw):
        scale = jnp.concatenate([hw[::-1], hw[::-1]]).astype(jnp.float32)
        n = gt_boxes / jnp.maximum(scale, 1.0)
        return jnp.clip(
            jnp.stack(
                [
                    (n[:, 0] + n[:, 2]) / 2,
                    (n[:, 1] + n[:, 3]) / 2,
                    n[:, 2] - n[:, 0],
                    n[:, 3] - n[:, 1],
                ],
                -1,
            ),
            0.0, 1.0,
        )

    gt_cxcywh = jax.vmap(to_cxcywh_norm)(batch["gt_boxes"], img_hw)

    def layer_loss_single(cls_pred, box_pred, gt_cc, labels, valid, hw):
        Q, C = cls_pred.shape
        assign = box_hungarian_assign(
            cls_pred, box_pred, labels, gt_cc, valid, hw,
            cls_weight=cls_weight, l1_weight=l1_weight,
            giou_weight=giou_weight,
        )
        q2g = assign.query2gt  # (Q,) gt index or -1
        pos = q2g >= 0
        safe = jnp.clip(q2g, 0, G - 1)
        tgt = jax.nn.one_hot(labels[safe], C) * pos[:, None]
        p = jax.nn.sigmoid(cls_pred.astype(jnp.float32))
        ce = -(tgt * jnp.log(jnp.clip(p, 1e-8)) +
               (1 - tgt) * jnp.log(jnp.clip(1 - p, 1e-8)))
        pt = tgt * p + (1 - tgt) * (1 - p)
        alpha_t = tgt * focal_alpha + (1 - tgt) * (1 - focal_alpha)
        focal = (alpha_t * (1 - pt) ** focal_gamma * ce).sum()

        npos = jnp.maximum(pos.sum(), 1.0)
        tgt_box = gt_cc[safe]
        l1 = jnp.abs(box_pred - tgt_box).sum(-1) * pos
        scale = jnp.concatenate([hw[::-1], hw[::-1]])
        gi = generalized_box_iou(
            cxcywh_to_xyxy(box_pred) * scale, cxcywh_to_xyxy(tgt_box) * scale
        )
        gi = jnp.diagonal(gi) * pos
        return (
            cls_weight * focal / npos,
            l1_weight * l1.sum() / npos,
            giou_weight * (pos.sum() - gi.sum()) / npos,
        )

    losses = {}
    layers = list(zip(outputs["cls_layers"], outputs["box_layers"]))
    layers.append((outputs["enc_cls"], outputs["enc_box"]))
    n_dec = len(outputs["cls_layers"])
    for li, (cls_l, box_l) in enumerate(layers):
        lc, lb, lg = jax.vmap(layer_loss_single)(
            cls_l, box_l, gt_cxcywh, gt_labels, gt_valid, img_hw
        )
        tag = (
            "" if li == n_dec - 1
            else (f"d{li}." if li < n_dec else "enc.")
        )
        losses[f"{tag}loss_cls"] = lc.mean()
        losses[f"{tag}loss_bbox"] = lb.mean()
        losses[f"{tag}loss_iou"] = lg.mean()
    losses["loss_total"] = sum(losses.values())
    return losses


def pairnet_bbox_loss(
    outputs,
    batch,
    rng,
    cum_samples,
    rel_loss_weight: float = 2.0,
    subobj_loss_weight: float = 4.0,
    match_loss_weight: float = 5.0,
):
    """Scene-graph losses for the bbox variant. Returns (losses, new_cum).

    ``batch`` needs gt_labels/gt_boxes(xyxy px)/gt_valid/gt_rels/rel_valid/
    image_shape. ``rng`` is unused (no point sampling) but kept for the
    shared dispatch signature.
    """
    from pairnet_tpu.models.losses import (
        bce_with_logits_pos_weight,
        seesaw_ce,
        softmax_ce,
    )

    del rng
    B, K, R = outputs["rel"].shape
    C = outputs["cls"].shape[-1]
    sg = jax.lax.stop_gradient
    r_labels, r_weights, sub_ids, obj_ids, gt_imp = jax.vmap(
        _bbox_targets_single
    )(
        sg(outputs["cls"]), sg(outputs["box"]),
        sg(outputs["sub"]), sg(outputs["obj"]), sg(outputs["rel"]),
        batch["gt_labels"], batch["gt_boxes"], batch["gt_valid"],
        batch["gt_rels"], batch["rel_valid"],
        batch["image_shape"].astype(jnp.float32),
    )
    w = r_weights.reshape(-1)
    loss_sub = softmax_ce(outputs["sub"].reshape(-1, C), sub_ids.reshape(-1), w)
    loss_obj = softmax_ce(outputs["obj"].reshape(-1, C), obj_ids.reshape(-1), w)
    loss_r, new_cum = seesaw_ce(
        outputs["rel"].reshape(-1, R), r_labels.reshape(-1), w, cum_samples
    )
    npos = jnp.maximum(jnp.sum(gt_imp > 0), 1.0)
    loss_match = bce_with_logits_pos_weight(
        outputs["importance"], gt_imp, gt_imp.size / npos
    )
    losses = {
        "loss_r_cls": rel_loss_weight * loss_r,
        "loss_sub_cls": subobj_loss_weight * loss_sub,
        "loss_obj_cls": subobj_loss_weight * loss_obj,
        "loss_match": match_loss_weight * loss_match,
    }
    losses["loss_total"] = sum(losses.values())
    return losses, new_cum


class BoxTripletPrediction(NamedTuple):
    """Fixed-shape per-image box-mode triplets (counterpart of the tuple at
    ref: pairnet_bbox_head.py:1037-1106)."""

    labels: jnp.ndarray  # (2K,) 1-based sub then obj
    rel_pairs: jnp.ndarray  # (K, 2)
    boxes: jnp.ndarray  # (2K, 4) normalized xyxy in [0,1]
    r_dists: jnp.ndarray  # (K, R+1) with zero bg col
    r_labels: jnp.ndarray
    r_scores: jnp.ndarray


def pairnet_bbox_postprocess(outputs, image_index=None, num_things: int = 0):
    """Box-mode inference (ref: pairnet_bbox_head.py:1037-1106): softmax over
    the gathered sub/obj class logits (+1 for 1-based), cxcywh -> xyxy,
    predicate distribution with a zero background column prepended; triplet
    ranking is the relation-query order (= descending top-k importance)."""
    from pairnet_tpu.ops.boxes import cxcywh_to_xyxy

    del num_things
    b = image_index
    get = (lambda x: x[b]) if b is not None else (lambda x: x)
    r_cls = get(outputs["rel"])  # (K, R)
    K, R = r_cls.shape
    r_dists = jax.nn.softmax(r_cls.astype(jnp.float32), -1)
    r_dists = jnp.concatenate([jnp.zeros((K, 1), jnp.float32), r_dists], -1)

    def cls_lbl(logits):
        p = jax.nn.softmax(logits.astype(jnp.float32), -1)
        return p.argmax(-1).astype(jnp.int32) + 1, p.max(-1)

    s_labels, s_scores = cls_lbl(get(outputs["sub"]))
    o_labels, o_scores = cls_lbl(get(outputs["obj"]))
    s_box = jnp.clip(cxcywh_to_xyxy(get(outputs["sub_box"])), 0.0, 1.0)
    o_box = jnp.clip(cxcywh_to_xyxy(get(outputs["obj_box"])), 0.0, 1.0)
    return BoxTripletPrediction(
        labels=jnp.concatenate([s_labels, o_labels]),
        rel_pairs=jnp.stack(
            [jnp.arange(K, dtype=jnp.int32), jnp.arange(K, 2 * K, dtype=jnp.int32)],
            -1,
        ),
        boxes=jnp.concatenate([s_box, o_box], 0),
        r_dists=r_dists,
        r_labels=r_dists[:, 1:].argmax(-1).astype(jnp.int32) + 1,
        r_scores=r_dists[:, 1:].max(-1),
    )
