"""Pair-Net head: Mask2Former segmenter + Pair Proposal Network + Relation Fusion.

TPU-native counterpart of the flagship ``CrossHead2``
(ref: pairnet/models/relation_heads/pairnet_head.py:23-417):

* embedded Mask2Former (pixel decoder + 9-layer masked-attn decoder),
* PPN: 3-layer sub/obj MLPs on the final queries, L2-normalized outer
  product -> (Q, Q) affinity, Matrix Learner CNN refinement, flattened
  top-k pair selection (ref: pairnet_head.py:322-340),
* Relation Fusion: learned relation queries cross-attending over the
  concatenated subject/object pair features with learned key positional
  tables (ref: pairnet_head.py:353-378). The reference also allocates a
  value-pos table (rel_query_embed3) that mmcv silently drops; we keep the
  parameter for checkpoint-conversion parity but never read it.
* outputs: cls (B,Q,C+1), rel (B,K,R), importance (B,Q,Q), gathered+detached
  sub/obj class preds and segs (ref: pairnet_head.py:380-417). The gathered
  *query features* are NOT detached — that is the only path training the
  segmenter (the cls/mask/dice losses are built but unused in the reference,
  ref: SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.decoders.mask2former_decoder import (
    DecoderLayer,
    Mask2FormerDecoder,
)
from pairnet_tpu.models.heads.matrix_learner import create_mapper
from pairnet_tpu.models.layers import MLP, sine_positional_encoding
from pairnet_tpu.models.necks.pixel_decoder import MSDeformAttnPixelDecoder


@HEADS.register()
class PairNetHead(nn.Module):
    num_classes: int = 133
    num_relations: int = 56
    num_obj_query: int = 100
    num_rel_query: int = 100
    mapper: str = "conv_tiny"
    embed_dims: int = 256
    num_heads: int = 8
    num_decoder_layers: int = 9
    num_relation_layers: int = 6
    num_feat_levels: int = 3
    pixel_decoder_layers: int = 6
    pixel_decoder_ffn: int = 1024
    decoder_ffn: int = 2048
    relation_ffn: int = 2048
    relation_ffn_drop: float = 0.1
    # CrossHeadDirect ablation (ref: pairnet/models/relation_heads/
    # pairnet_direct.py:22-120): pair features classified directly through a
    # pair-embed MLP, no Relation Fusion decoder
    direct: bool = False

    def setup(self):
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=self.embed_dims,
            out_channels=self.embed_dims,
            num_encoder_levels=self.num_feat_levels,
            num_encoder_layers=self.pixel_decoder_layers,
            num_heads=self.num_heads,
            feedforward_channels=self.pixel_decoder_ffn,
            name="pixel_decoder",
        )
        self.transformer_decoder = Mask2FormerDecoder(
            num_classes=self.num_classes,
            num_queries=self.num_obj_query,
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_layers=self.num_decoder_layers,
            num_feat_levels=self.num_feat_levels,
            feedforward_channels=self.decoder_ffn,
            out_channels=self.embed_dims,
            name="transformer_decoder",
        )
        K, C = self.num_rel_query, self.embed_dims
        init = nn.initializers.normal(1.0)
        self.rel_query_feat = self.param("rel_query_feat", init, (K, C))
        self.rel_query_embed = self.param("rel_query_embed", init, (K, C))
        self.rel_query_embed2 = self.param("rel_query_embed2", init, (2 * K, C))
        # dead in the reference (mmcv drops value_pos); kept for ckpt parity
        self.rel_query_embed3 = self.param("rel_query_embed3", init, (2 * K, C))
        self.sub_query_update = MLP(C, C, 3, name="sub_query_update")
        self.obj_query_update = MLP(C, C, 3, name="obj_query_update")
        self.rel_cls_embed = nn.Dense(self.num_relations, name="rel_cls_embed")
        self.update_importance = create_mapper(self.mapper)
        if self.direct:
            self.pair_embed = MLP(C, C, 3, name="pair_embed")
        self.relation_layers = [
            DecoderLayer(
                C,
                self.num_heads,
                self.relation_ffn,
                ffn_drop=self.relation_ffn_drop,
                name=f"relation_layer_{i}",
            )
            for i in range(self.num_relation_layers)
        ]

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        """feats: backbone (C2, C3, C4, C5) NHWC. Returns prediction dict."""
        mask_features, ms_feats = self.pixel_decoder(feats)
        pos_encodings = [
            sine_positional_encoding(
                f.shape[1], f.shape[2], self.embed_dims // 2
            ).astype(f.dtype)
            for f in ms_feats
        ]
        dec = self.transformer_decoder(ms_feats, mask_features, pos_encodings)
        cls_pred = dec["cls"]  # (B, Q, C+1)
        mask_pred = dec["mask"]  # (B, Q, h4, w4)
        queries = dec["queries"]  # (B, Q, C)
        B, Q, C = queries.shape
        K = self.num_rel_query

        # --- Pair Proposal Network ---
        sub_embed = self.sub_query_update(queries)
        obj_embed = self.obj_query_update(queries)
        sub_embed = sub_embed / jnp.maximum(
            jnp.linalg.norm(sub_embed, axis=-1, keepdims=True), 1e-12
        )
        obj_embed = obj_embed / jnp.maximum(
            jnp.linalg.norm(obj_embed, axis=-1, keepdims=True), 1e-12
        )
        importance = jnp.einsum(
            "bqc,bkc->bqk", sub_embed, obj_embed, preferred_element_type=jnp.float32
        )
        importance = self.update_importance(importance)  # (B, Q, Q)

        _, topk_idx = jax.lax.top_k(importance.reshape(B, Q * Q), K)
        sub_pos = topk_idx // Q  # (B, K)
        obj_pos = topk_idx % Q

        take = jax.vmap(lambda arr, idx: jnp.take(arr, idx, axis=0))
        sub_query_feat = take(queries, sub_pos)  # (B, K, C) NOT detached
        obj_query_feat = take(queries, obj_pos)
        pair_feat = jnp.concatenate([sub_query_feat, obj_query_feat], axis=1)

        if self.direct:
            # CrossHeadDirect ablation: classify pair features directly
            pair_cat = jnp.concatenate([sub_query_feat, obj_query_feat], axis=-1)
            rel_preds = self.rel_cls_embed(self.pair_embed(pair_cat))
        else:
            # --- Relation Fusion ---
            rel_query = jnp.broadcast_to(self.rel_query_feat[None], (B, K, C))
            rel_query_pos = self.rel_query_embed[None]
            key_pos = self.rel_query_embed2[None]
            for layer in self.relation_layers:
                rel_query = layer(
                    rel_query,
                    rel_query_pos,
                    pair_feat,
                    key_pos,
                    None,
                    deterministic=deterministic,
                )
            rel_preds = self.rel_cls_embed(rel_query)  # (B, K, R)

        sg = jax.lax.stop_gradient
        sub_cls_preds = take(sg(cls_pred), sub_pos)
        obj_cls_preds = take(sg(cls_pred), obj_pos)
        sub_seg = take(sg(mask_pred), sub_pos)
        obj_seg = take(sg(mask_pred), obj_pos)

        return {
            "cls": cls_pred,
            "mask": mask_pred,
            "rel": rel_preds,
            "importance": importance,
            "sub": sub_cls_preds,
            "obj": obj_cls_preds,
            "sub_seg": sub_seg,
            "obj_seg": obj_seg,
            "sub_pos": sub_pos,
            "obj_pos": obj_pos,
            "queries": queries,
        }
