"""Masked-attention transformer decoder (Mask2Former), batch-first.

Behavioral counterpart of the reference's 9-layer transformer decoder with
per-layer mask prediction heads (ref: configs/mask2former/pairnet.py:72-105;
pairnet/models/relation_heads/pairnet_head.py:216-320):

* layer order cross_attn -> norm -> self_attn -> norm -> ffn -> norm
  (post-norm), FFN 2048,
* masked cross-attention: per-query bool mask = sigmoid(resized mask
  logits) < 0.5, detached, shared across heads; all-masked rows reset to
  unmasked (ref: pairnet_head.py:300),
* per-layer head: shared post-norm LayerNorm -> cls logits + 3-layer
  mask-embed MLP -> einsum with stride-4 mask features,
* round-robin over the three encoder scales, low -> high resolution.
"""

from __future__ import annotations

import os as _os
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.models.layers import FFN, MLP, MultiheadAttention
from pairnet_tpu.models.necks.pixel_decoder import bilinear_resize

# resize-then-contract attention masks (see Mask2FormerDecoder.attn_mask_small);
# PAIRNET_FAST_MASKS=0 restores the reference full-resolution route for A/B
_FAST_MASKS = _os.environ.get("PAIRNET_FAST_MASKS", "1") != "0"


class DecoderLayer(nn.Module):
    """cross_attn -> norm -> self_attn -> norm -> ffn -> norm (post-norm).

    Shared by the Mask2Former query decoder (ffn_drop 0) and the Relation
    Fusion decoder (ffn_drop 0.1; ref: configs/mask2former/pairnet.py:107-137).
    ``memory_pos`` is added to keys only (mmcv MultiheadAttention semantics:
    value carries no positional term).
    """

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048
    ffn_drop: float = 0.0

    @nn.compact
    def __call__(
        self, query, query_pos, memory, memory_pos, attn_mask, deterministic=True
    ):
        mem_k = memory if memory_pos is None else memory + memory_pos
        x = query + MultiheadAttention(
            self.embed_dims, self.num_heads, name="cross_attn"
        )(query + query_pos, mem_k, memory, attn_mask=attn_mask)
        x = nn.LayerNorm(name="norm1")(x)
        x = x + MultiheadAttention(
            self.embed_dims, self.num_heads, name="self_attn"
        )(x + query_pos, x + query_pos, x)
        x = nn.LayerNorm(name="norm2")(x)
        x = x + FFN(
            self.embed_dims, self.feedforward_channels, ffn_drop=self.ffn_drop,
            name="ffn",
        )(x, deterministic=deterministic)
        return nn.LayerNorm(name="norm3")(x)


class Mask2FormerDecoder(nn.Module):
    """Runs the query decoder and per-layer heads.

    Returns the final (cls_pred, mask_pred) pair, the full query history
    (num_layers, B, Q, C), and per-layer predictions when
    ``return_intermediate`` (needed by heads that train per-layer losses,
    e.g. the PSGFormer+ baseline; Pair-Net itself only uses the last).
    """

    num_classes: int = 133
    num_queries: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_layers: int = 9
    num_feat_levels: int = 3
    feedforward_channels: int = 2048
    out_channels: int = 256
    return_intermediate: bool = False
    # run the per-layer prediction head (post_norm -> cls/mask embeds ->
    # mask einsum -> resize -> sigmoid<0.5 threshold) in f32 even when the
    # trunk is bf16: the attention mask is a DISCRETE threshold on the mask
    # logits (ref: pairnet_head.py:247-258), so removing the head's own
    # rounding sources (bf16 MLP intermediates and einsum operands) shrinks
    # the set of near-zero logits that bf16 serving can flip. Costs ~1% of
    # the forward (the f32 einsum); no effect on f32 runs.
    f32_mask_head: bool = True

    def setup(self):
        self.query_feat = self.param(
            "query_feat", nn.initializers.normal(1.0), (self.num_queries, self.embed_dims)
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, self.embed_dims)
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (self.num_feat_levels, self.embed_dims)
        )
        self.layers = [
            DecoderLayer(
                self.embed_dims,
                self.num_heads,
                self.feedforward_channels,
                name=f"layer_{i}",
            )
            for i in range(self.num_layers)
        ]
        self.post_norm = nn.LayerNorm(name="post_norm")
        self.cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
        self.mask_embed = MLP(self.embed_dims, self.out_channels, 3, name="mask_embed")
        self.input_projs = [None] * self.num_feat_levels  # identity (dims match)

    def forward_head(self, query, mask_features, attn_target_hw):
        """query (B, Q, C); mask_features (B, h4, w4, C)."""
        if self.f32_mask_head:
            query = query.astype(jnp.float32)
            mask_features = mask_features.astype(jnp.float32)
        out = self.post_norm(query)
        cls_pred = self.cls_embed(out)
        mask_embed = self.mask_embed(out)
        mask_pred = jnp.einsum(
            "bqc,bhwc->bqhw", mask_embed, mask_features,
            preferred_element_type=jnp.float32,
        )
        am = jnp.transpose(mask_pred, (0, 2, 3, 1))  # (B, h, w, Q)
        am = bilinear_resize(am, attn_target_hw)
        am = am.reshape(am.shape[0], -1, am.shape[-1]).transpose(0, 2, 1)  # (B,Q,S)
        attn_mask = jax.lax.stop_gradient(jax.nn.sigmoid(am) < 0.5)
        return cls_pred, mask_pred, attn_mask

    def attn_mask_small(self, query, mask_features_small):
        """Attention mask via the resize-then-contract route.

        Bilinear resize is LINEAR in its input, so it commutes with the
        channel contraction: resize(embed . mf) == embed . resize(mf).
        Resizing the (C=256-channel) mask features ONCE per level and
        contracting at the attention resolution replaces the reference's
        per-layer full-resolution (B, Q, h4, w4) einsum + downscale
        (ref pairnet_head.py:247-258) with a ~10x smaller einsum — same
        operator up to f32 reassociation. Used when the intermediate
        full-resolution mask logits are not consumed (serving); training
        with per-layer mask losses keeps the reference route.
        """
        if self.f32_mask_head:
            query = query.astype(jnp.float32)
        out = self.post_norm(query)
        mask_embed = self.mask_embed(out)
        am = jnp.einsum(
            "bqc,bsc->bqs", mask_embed, mask_features_small,
            preferred_element_type=jnp.float32,
        )  # (B, Q, h*w)
        return jax.lax.stop_gradient(jax.nn.sigmoid(am) < 0.5)

    def __call__(self, multi_scale_feats: Sequence[jnp.ndarray], mask_features, pos_encodings):
        """multi_scale_feats: low->high res (B, h, w, C) x3; pos_encodings same shapes."""
        B = mask_features.shape[0]
        memories = []
        memory_pos = []
        shapes = []
        for lvl, f in enumerate(multi_scale_feats):
            h, w = f.shape[1], f.shape[2]
            memories.append(f.reshape(B, h * w, self.embed_dims) + self.level_embed[lvl])
            memory_pos.append(pos_encodings[lvl].reshape(1, h * w, self.embed_dims))
            shapes.append((h, w))

        query = jnp.broadcast_to(
            self.query_feat[None], (B, self.num_queries, self.embed_dims)
        )
        query_pos = self.query_embed[None]

        fast_masks = not self.return_intermediate and _FAST_MASKS
        if fast_masks:
            # resize-then-contract (see attn_mask_small): stage the mask
            # features once per attention resolution
            mf = mask_features
            if self.f32_mask_head:
                mf = mf.astype(jnp.float32)
            mf_small = [
                bilinear_resize(mf, hw).reshape(B, hw[0] * hw[1], -1)
                for hw in shapes
            ]
            attn_mask = self.attn_mask_small(query, mf_small[0])
        else:
            cls_pred, mask_pred, attn_mask = self.forward_head(
                query, mask_features, shapes[0]
            )
        intermediates = []
        query_list = []
        for i, layer in enumerate(self.layers):
            lvl = i % self.num_feat_levels
            # all-masked rows attend everywhere instead (ref pairnet_head.py:300)
            all_masked = attn_mask.all(axis=-1, keepdims=True)
            attn_mask = jnp.where(all_masked, False, attn_mask)
            query = layer(
                query,
                query_pos,
                memories[lvl],
                memory_pos[lvl],
                attn_mask[:, None, :, :],  # broadcast over heads
            )
            if fast_masks:
                if i + 1 < self.num_layers:
                    attn_mask = self.attn_mask_small(
                        query, mf_small[(i + 1) % self.num_feat_levels]
                    )
            else:
                cls_pred, mask_pred, attn_mask = self.forward_head(
                    query, mask_features, shapes[(i + 1) % self.num_feat_levels]
                )
            query_list.append(query)
            if self.return_intermediate:
                intermediates.append((cls_pred, mask_pred))
        if fast_masks:
            # the final full-resolution logits are the model output; only
            # this one einsum runs at (h4, w4)
            cls_pred, mask_pred, _ = self.forward_head(
                query, mask_features, (1, 1)
            )

        return {
            "cls": cls_pred,
            "mask": mask_pred,
            "queries": query,
            "query_history": jnp.stack(query_list),
            "intermediates": intermediates,
        }
