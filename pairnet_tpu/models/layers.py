"""Shared neural building blocks (flax.linen, batch-first, NHWC).

Behavioral counterparts of the mmcv/torch bricks the reference composes:
``nn.MultiheadAttention`` (packed-qkv semantics, bool attn masks), mmcv FFN,
SinePositionalEncoding (ref: configs/mask2former/pairnet.py:67-69),
MultiScaleDeformableAttention (mmcv CUDA; here over
:func:`pairnet_tpu.ops.deform_attn.ms_deform_attn`), frozen BatchNorm, and
RMSNorm/SwiGLU (ref: pairnet/models/frameworks/fc.py:7-26, used by the VG
relation decoder).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.ops.deform_attn import ms_deform_attn


def sine_positional_encoding(
    h: int,
    w: int,
    num_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    offset: float = 0.0,
    eps: float = 1e-6,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """DETR sine positional encoding for an unpadded (h, w) map -> (h, w, 2*num_feats).

    Matches mmdet SinePositionalEncoding(num_feats, normalize=True) with a
    zero padding mask: cumsum over rows/cols, y-features first then x.
    """
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] * jnp.ones((1, w))
    x_embed = jnp.ones((h, 1)) * jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    if normalize:
        y_embed = (y_embed + offset) / (h + eps) * scale
        x_embed = (x_embed + offset) / (w + eps) * scale
    dim_t = jnp.arange(num_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[..., None] / dim_t
    pos_y = y_embed[..., None] / dim_t
    # interleave sin (even dims) / cos (odd dims)
    pos_x = jnp.stack([jnp.sin(pos_x[..., 0::2]), jnp.cos(pos_x[..., 1::2])], axis=-1)
    pos_y = jnp.stack([jnp.sin(pos_y[..., 0::2]), jnp.cos(pos_y[..., 1::2])], axis=-1)
    pos_x = pos_x.reshape(h, w, num_feats)
    pos_y = pos_y.reshape(h, w, num_feats)
    return jnp.concatenate([pos_y, pos_x], axis=-1).astype(dtype)


class MLP(nn.Module):
    """n-layer ReLU MLP (ref pattern: pairnet_head.py:160-175 sub/obj updates)."""

    hidden_dim: int
    out_dim: int
    num_layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        return nn.Dense(self.out_dim, name=f"layers_{self.num_layers - 1}")(x)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention semantics, batch-first.

    ``attn_mask`` is bool with True = masked-out (not attended), shaped
    (B, num_heads, Lq, Lk) or (B, 1, Lq, Lk). Softmax in fp32.
    """

    embed_dims: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None, deterministic=True):
        C, H = self.embed_dims, self.num_heads
        D = C // H
        q = nn.Dense(C, name="q_proj")(query)
        k = nn.Dense(C, name="k_proj")(key)
        v = nn.Dense(C, name="v_proj")(value)

        B, Lq, _ = q.shape
        Lk = k.shape[1]
        q = q.reshape(B, Lq, H, D).transpose(0, 2, 1, 3)
        k = k.reshape(B, Lk, H, D).transpose(0, 2, 1, 3)
        v = v.reshape(B, Lk, H, D).transpose(0, 2, 1, 3)

        # flash-style fused masked attention (SURVEY §5.7): the (B, H, Lq,
        # Lk) score tensor never leaves VMEM. Inference-only (no VJP) and
        # only worthwhile for long memories with a head-shared mask; opt in
        # via PAIRNET_FLASH_ATTN=1 (tools/test.py / bench.py inference).
        import os as _os

        if (
            _os.environ.get("PAIRNET_FLASH_ATTN") == "1"
            and attn_mask is not None
            and attn_mask.shape[1] == 1
            and Lk >= 2048
            and self.attn_drop == 0
        ):
            from pairnet_tpu.ops.pallas_masked_attn import (
                ST,
                masked_flash_attention,
            )

            Lqp = -(-Lq // 8) * 8
            Lkp = -(-Lk // ST) * ST
            qf = jnp.pad(
                q.reshape(B * H, Lq, D), ((0, 0), (0, Lqp - Lq), (0, 0))
            )
            kf = jnp.pad(
                k.reshape(B * H, Lk, D), ((0, 0), (0, Lkp - Lk), (0, 0))
            )
            vf = jnp.pad(
                v.reshape(B * H, Lk, D), ((0, 0), (0, Lkp - Lk), (0, 0))
            )
            mf = jnp.pad(
                attn_mask[:, 0].astype(jnp.int8),
                ((0, 0), (0, Lqp - Lq), (0, Lkp - Lk)),
                constant_values=1,  # padded keys masked out
            )
            out = masked_flash_attention(qf, kf, vf, mf, H)
            out = out[:, :Lq].reshape(B, H, Lq, D).transpose(0, 2, 1, 3)
            out = out.astype(value.dtype).reshape(B, Lq, C)
            out = nn.Dense(C, name="out_proj")(out)
            if self.proj_drop > 0:
                out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
            return out

        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * (1.0 / math.sqrt(D))
        if attn_mask is not None:
            logits = jnp.where(attn_mask, -1e9, logits)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Lq, C)
        out = nn.Dense(C, name="out_proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class FFN(nn.Module):
    """mmcv FFN: Dense -> act -> drop -> Dense -> drop, residual added by caller."""

    embed_dims: int
    feedforward_channels: int
    ffn_drop: float = 0.0
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, deterministic=True):
        y = nn.Dense(self.feedforward_channels, name="fc1")(x)
        y = self.activation(y)
        if self.ffn_drop > 0:
            y = nn.Dropout(self.ffn_drop)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, name="fc2")(y)
        if self.ffn_drop > 0:
            y = nn.Dropout(self.ffn_drop)(y, deterministic=deterministic)
        return y


class FrozenBatchNorm(nn.Module):
    """BatchNorm with all statistics and affine params frozen.

    The reference freezes BN everywhere (norm_eval=True +
    requires_grad=False, ref: configs/mask2former/pairnet.py:15-16); the four
    tensors live in the ``constants`` collection so they are never trained.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        shape = (self.features,)
        weight = self.variable("constants", "weight", jnp.ones, shape).value
        bias = self.variable("constants", "bias", jnp.zeros, shape).value
        mean = self.variable("constants", "running_mean", jnp.zeros, shape).value
        var = self.variable("constants", "running_var", jnp.ones, shape).value
        scale = weight * jax.lax.rsqrt(var + self.eps)
        return x * scale + (bias - mean * scale)


class RMSNorm(nn.Module):
    """RMSNorm (ref: pairnet/models/frameworks/fc.py:7-16)."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,))
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + self.eps)).astype(x.dtype) * weight


class SwiGLU(nn.Module):
    """SwiGLU FFN activation block (ref: pairnet/models/frameworks/fc.py:19-26)."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        gate = nn.Dense(self.hidden_dim, use_bias=False, name="w1")(x)
        up = nn.Dense(self.hidden_dim, use_bias=False, name="w3")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="w2")(nn.silu(gate) * up)


def _deform_offsets_init(num_heads, num_levels, num_points):
    """mmcv MultiScaleDeformableAttention sampling_offsets bias init."""
    thetas = jnp.arange(num_heads, dtype=jnp.float32) * (2.0 * math.pi / num_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / jnp.abs(grid).max(axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = jnp.arange(1, num_points + 1, dtype=jnp.float32)[None, None, :, None]
    return (grid * scale).reshape(-1)


class MSDeformAttention(nn.Module):
    """Multi-scale deformable self/cross attention (batch-first).

    TPU counterpart of mmcv's MultiScaleDeformableAttention
    (ref: configs/mask2former/pairnet.py:44-54). Residual + identity handled
    here (mmcv adds identity inside the attention module).
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 3
    num_points: int = 4
    # 'patch' resolves to the Pallas kernel on TPU (see ops/deform_attn.py)
    impl: str = "patch"
    # the caller runs on transposed (column-major) planes: the offsets
    # layer predicts (dx, dy) in image axes, swap to the transposed frame
    swap_offset_xy: bool = False
    # sequence parallelism (SURVEY §5.7: shard the H*W token axis): set to
    # the mesh axis name when applied inside shard_map with queries/values
    # sharded on the token axis. The value projection runs on the LOCAL
    # shard; ONE all_gather of the projected plane per layer rides ICI, and
    # every other matmul (offsets/attn/output proj) stays 1/m-sized.
    seq_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        query,  # (B, Q, C) -- content features
        value,  # (B, S, C) -- flattened multi-level features
        reference_points,  # (B, Q, L, 2) normalized (x, y)
        spatial_shapes: Sequence[tuple[int, int]],
        query_pos=None,
        identity=None,
    ):
        B, Q, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        v = nn.Dense(C, name="value_proj")(value).reshape(B, -1, H, C // H)
        if self.seq_axis is not None:
            v = jax.lax.all_gather(v, self.seq_axis, axis=1, tiled=True)
        offsets_raw = nn.Dense(
            H * L * P * 2,
            name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: _deform_offsets_init(
                H, L, P
            ).astype(dtype),
        )(query)
        attn_raw = nn.Dense(
            H * L * P,
            name="attention_weights",
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )(query)

        offsets = offsets_raw.reshape(B, Q, H, L, P, 2)
        if self.swap_offset_xy:
            offsets = offsets[..., ::-1]
        attn = attn_raw.reshape(B, Q, H, L * P)
        attn = jax.nn.softmax(attn, axis=-1).reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 4:
            # box references (deformable-DETR with_box_refine/two-stage):
            # loc = cxcy + offset / P * wh * 0.5 (mmcv MSDA semantics)
            ref = reference_points[:, :, None, :, None, :]
            locs = ref[..., :2] + offsets / P * ref[..., 2:] * 0.5
        else:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], jnp.float32
            )  # (L, 2) as (w, h)
            locs = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        out = ms_deform_attn(v, spatial_shapes, locs, attn, impl=self.impl)
        # kernels accumulate/return f32; cast back so bf16 inference keeps
        # the downstream projections/FFNs on the bf16 MXU path
        out = nn.Dense(C, name="output_proj")(out.astype(identity.dtype))
        return identity + out


def encoder_reference_points(
    spatial_shapes: Sequence[tuple[int, int]],
) -> jnp.ndarray:
    """Per-pixel normalized center reference points, broadcast over levels.

    Returns (S, L, 2) with S = sum h*w (deformable-DETR encoder convention,
    valid_ratios == 1 since we use unpadded per-bucket shapes).
    """
    L = len(spatial_shapes)
    refs = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        refs.append(jnp.stack([xx, yy], axis=-1).reshape(-1, 2))
    ref = jnp.concatenate(refs, axis=0)  # (S, 2)
    return jnp.tile(ref[:, None, :], (1, L, 1))
