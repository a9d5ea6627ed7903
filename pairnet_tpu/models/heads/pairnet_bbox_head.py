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

from typing import Sequence

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
            outs.append(nn.GroupNorm(num_groups=32, name=f"gn_{i}")(x))
        i = len(feats)
        while len(outs) < self.num_outs:
            x = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2),
                padding=[(1, 1), (1, 1)], name=f"extra_conv_{i}",
            )(outs[-1] if len(outs) > len(feats) - 1 else feats[-1])
            outs.append(nn.GroupNorm(num_groups=32, name=f"extra_gn_{i}")(x))
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


class RelationFusionLayerRMS(nn.Module):
    """Relation decoder layer with RMSNorm + SwiGLU FFN (VG variant)."""

    embed_dims: int = 256
    num_heads: int = 8
    ffn_hidden: int = 2048

    @nn.compact
    def __call__(self, q, qpos, memory, key_pos):
        x = q + MultiheadAttention(self.embed_dims, self.num_heads, name="cross_attn")(
            q + qpos, memory + key_pos, memory
        )
        x = RMSNorm(self.embed_dims, name="norm1")(x)
        x = x + MultiheadAttention(self.embed_dims, self.num_heads, name="self_attn")(
            x + qpos, x + qpos, x
        )
        x = RMSNorm(self.embed_dims, name="norm2")(x)
        x = x + SwiGLU(self.ffn_hidden, self.embed_dims, name="ffn")(x)
        return RMSNorm(self.embed_dims, name="norm3")(x)


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

    def setup(self):
        C = self.embed_dims
        init = nn.initializers.normal(1.0)
        self.neck = ChannelMapper(C, self.num_levels, name="neck")
        self.encoder_layers = [
            DeformableEncoderLayer(
                C, self.num_heads, self.num_levels, 4, 1024, name=f"enc_{i}"
            )
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DeformableDecoderLayer(
                C, self.num_heads, self.num_levels, 4, 1024, name=f"dec_{i}"
            )
            for i in range(self.num_decoder_layers)
        ]
        self.level_embed = self.param("level_embed", init, (self.num_levels, C))
        # two-stage proposal heads on the encoder memory
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
            RelationFusionLayerRMS(C, self.num_heads, name=f"relation_layer_{i}")
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
        # two-stage: encoder proposals -> top-k query init
        enc_logits = self.enc_cls(mem)  # (B, S, C_cls)
        enc_delta = self.enc_box(mem)
        enc_boxes = jax.nn.sigmoid(
            enc_delta + inverse_sigmoid(
                jnp.concatenate(
                    [ref[:, :, 0, :], jnp.full((B, ref.shape[1], 2), 0.1)], -1
                )
            )
        )  # (B, S, 4) cxcywh
        scores = enc_logits.max(-1)
        _, topk = jax.lax.top_k(scores, Q)
        take = jax.vmap(lambda a, i: a[i])
        ref_boxes = jax.lax.stop_gradient(take(enc_boxes, topk))  # (B, Q, 4)
        pos_feat = self.pos_trans_norm(
            self.pos_trans(
                jnp.concatenate(
                    [
                        jnp.sin(ref_boxes * 6.2832),
                        jnp.cos(ref_boxes * 6.2832),
                    ],
                    -1,
                ).repeat(C // 8, axis=-1)[..., : 2 * C]
            )
        )
        qpos, q = jnp.split(pos_feat, 2, axis=-1)

        cls_layers, box_layers = [], []
        for i, layer in enumerate(self.decoder_layers):
            # deformable cross-attn reference = box centers, per level
            ref_pts = jnp.broadcast_to(
                ref_boxes[:, :, None, :2], (B, Q, self.num_levels, 2)
            )
            q = layer(q, qpos, mem, ref_pts, shapes)
            cls_layers.append(self.cls_branches[i](q))
            delta = self.reg_branches[i](q)
            new_boxes = jax.nn.sigmoid(delta + inverse_sigmoid(ref_boxes))
            box_layers.append(new_boxes)
            if self.with_box_refine:
                ref_boxes = jax.lax.stop_gradient(new_boxes)

        queries = q  # (B, Q, C)
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

        sg = jax.lax.stop_gradient
        return {
            "cls": cls_layers[-1],  # (B, Q, C_cls) sigmoid-style logits
            "box": box_layers[-1],
            "cls_layers": cls_layers,
            "box_layers": box_layers,
            "enc_cls": enc_logits,
            "enc_box": enc_boxes,
            "rel": rel_preds,
            "importance": importance,
            "sub": take(sg(cls_layers[-1]), sub_pos),
            "obj": take(sg(cls_layers[-1]), obj_pos),
            "sub_box": take(sg(box_layers[-1]), sub_pos),
            "obj_box": take(sg(box_layers[-1]), obj_pos),
            "sub_pos": sub_pos,
            "obj_pos": obj_pos,
            "queries": queries,
        }
