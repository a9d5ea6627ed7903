"""MSDeformAttn pixel decoder (Mask2Former neck), NHWC / batch-first.

Behavioral counterpart of mmdet's MSDeformAttnPixelDecoder as configured by
the reference (ref: configs/mask2former/pairnet.py:32-70, built at
pairnet/models/relation_heads/pairnet_head.py:88-94):

* 1x1 GN input projections of the three lowest-resolution backbone levels
  (C5, C4, C3 -> encoder levels 0, 1, 2),
* 6 deformable self-attention encoder layers (8 heads, 4 points, FFN 1024,
  post-norm) over the concatenated multi-level token sequence,
* FPN-style fusion of the stride-8 encoder output with C2 (lateral 1x1 GN +
  3x3 GN ReLU) and a final 3x3 conv producing stride-4 mask features.

Returns ``(mask_features (B, H/4, W/4, C), multi_scale_features)`` with
multi-scale features ordered low -> high resolution (stride 32, 16, 8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.models.layers import (
    FFN,
    MSDeformAttention,
    encoder_reference_points,
    sine_positional_encoding,
)


def bilinear_resize(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) for NHWC.

    antialias=False matters: torch point-samples when downscaling (e.g. the
    Mask2Former decoder shrinking mask logits to each attention resolution),
    while jax.image.resize would otherwise apply a triangle filter.
    """
    if x.ndim == 3:
        return jax.image.resize(
            x, (*size, x.shape[-1]), method="linear", antialias=False
        )
    return jax.image.resize(
        x, (x.shape[0], *size, x.shape[-1]), method="linear", antialias=False
    )


class DeformableEncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    feedforward_channels: int = 1024
    # set when the caller feeds column-major token planes (see
    # MSDeformAttnPixelDecoder): predicted offsets are (dx, dy) in image
    # axes and must swap to match the transposed reference frame
    swap_offset_xy: bool = False
    # sequence-parallel mesh axis (see parallel/spatial.py)
    seq_axis: str | None = None

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes):
        # self_attn -> norm -> ffn -> norm (post-norm, mmcv operation_order)
        x = MSDeformAttention(
            self.embed_dims,
            self.num_heads,
            self.num_levels,
            self.num_points,
            swap_offset_xy=self.swap_offset_xy,
            seq_axis=self.seq_axis,
            name="attn",
        )(x, x, reference_points, spatial_shapes, query_pos=pos)
        x = nn.LayerNorm(name="norm1")(x)
        x = x + FFN(self.embed_dims, self.feedforward_channels, name="ffn")(x)
        return nn.LayerNorm(name="norm2")(x)


class MSDeformAttnPixelDecoder(nn.Module):
    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_levels: int = 3
    num_encoder_layers: int = 6
    num_heads: int = 8
    num_points: int = 4
    feedforward_channels: int = 1024
    num_outs: int = 3

    @nn.compact
    def __call__(self, feats):
        """feats: (C2, C3, C4, C5) NHWC, high -> low resolution."""
        B = feats[0].shape[0]
        C = self.feat_channels
        L = self.num_encoder_levels
        n_in = len(feats)

        level_embed = self.param(
            "level_encoding", nn.initializers.normal(1.0), (L, C)
        )

        # Landscape inputs run the encoder on TRANSPOSED (column-major)
        # token planes: the deform-attn kernel scans 128-lane blocks of the
        # value plane, and a query tile's union block span is (perpendicular
        # extent) x (lane-dim size) — putting the SHORT image axis in lanes
        # cuts block visits ~1.8x at this geometry (see
        # ops/pallas_deform_attn_v7.py).  Pure relabeling of axes: the same
        # pixels/pos values in column-major order, predicted (dx, dy)
        # offsets swapped to the transposed frame.  Numerics are unchanged.
        transpose = all(f.shape[2] >= f.shape[1] for f in feats) and any(
            f.shape[2] > f.shape[1] for f in feats
        )

        # encoder levels: 0 = lowest resolution (C5)
        enc_feats = []
        pos_embeds = []
        spatial_shapes = []
        for lvl in range(L):
            f = feats[n_in - 1 - lvl]
            h, w = f.shape[1], f.shape[2]
            x = nn.Conv(C, (1, 1), use_bias=True, name=f"input_conv_{lvl}")(f)
            x = nn.GroupNorm(num_groups=32, name=f"input_gn_{lvl}")(x)
            # parity: pos values computed in IMAGE orientation; each token
            # keeps its own pos value under the transposition
            pos = sine_positional_encoding(h, w, C // 2).astype(x.dtype)
            if transpose:
                x = x.transpose(0, 2, 1, 3)
                pos = pos.transpose(1, 0, 2)
                h, w = w, h
            # mmdet adds the level embed to the POSITIONAL encoding (not the
            # tokens): value_proj inputs and the residual stream must not
            # carry it (conversion parity with mmcv's decoder)
            enc_feats.append(x.reshape(B, h * w, C))
            pos_embeds.append(
                jnp.broadcast_to(
                    pos.reshape(1, h * w, C) + level_embed[lvl], (B, h * w, C)
                )
            )
            spatial_shapes.append((h, w))

        tokens = jnp.concatenate(enc_feats, axis=1)
        pos = jnp.concatenate(pos_embeds, axis=1)
        ref = encoder_reference_points(spatial_shapes)
        ref = jnp.broadcast_to(ref[None], (B, *ref.shape))

        for i in range(self.num_encoder_layers):
            tokens = DeformableEncoderLayer(
                C,
                self.num_heads,
                L,
                self.num_points,
                self.feedforward_channels,
                swap_offset_xy=transpose,
                name=f"encoder_layer_{i}",
            )(tokens, pos, ref, spatial_shapes)

        # split back to 2D maps, low -> high resolution
        outs = []
        start = 0
        for h, w in spatial_shapes:
            m = tokens[:, start : start + h * w].reshape(B, h, w, C)
            outs.append(m.transpose(0, 2, 1, 3) if transpose else m)
            start += h * w

        # FPN top-down for the remaining (higher-res) levels, C2 only here
        y = outs[-1]
        for i in range(n_in - 1 - L, -1, -1):
            lat = nn.Conv(C, (1, 1), use_bias=True, name=f"lateral_conv_{i}")(feats[i])
            lat = nn.GroupNorm(num_groups=32, name=f"lateral_gn_{i}")(lat)
            y = lat + bilinear_resize(y, (lat.shape[1], lat.shape[2]))
            y = nn.Conv(
                C, (3, 3), padding=[(1, 1), (1, 1)], use_bias=True,
                name=f"output_conv_{i}",
            )(y)
            y = nn.relu(nn.GroupNorm(num_groups=32, name=f"output_gn_{i}")(y))

        mask_features = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)], name="mask_feature"
        )(y)
        return mask_features, tuple(outs[: self.num_outs])
