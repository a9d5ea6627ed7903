"""Swin Transformer backbone (NHWC, fixed shapes, windowed attention).

Counterpart of the mmdet SwinTransformer used by the reference's Swin-B
flagship row (ref: SURVEY.md §6 — Pair-Net Swin-B/Mask2Former; reference
config family configs/mask2former/pairnet_swinb*). Standard Swin:
4x4 patch embed, stages of (shifted-)window attention with relative position
bias, patch merging between stages; returns (C2, C3, C4, C5)-equivalent
feature maps at strides 4/8/16/32.

Swin-B defaults: embed 128, depths (2, 2, 18, 2), heads (4, 8, 16, 32),
window 12. Inputs must pad to multiples of 4*window on each side (the
fixed-shape pipeline guarantees this via PipelineConfig.size_divisor).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import BACKBONES


def _rel_pos_index(window: int) -> np.ndarray:
    """(W^2, W^2) indices into the (2W-1)^2 relative bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    ).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (2, W^2, W^2)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x (num_windows*B, W^2, C); mask (nW, W^2, W^2) additive or None."""
        Wsq = self.window * self.window
        H = self.num_heads
        D = self.dim // H
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(*t.shape[:-1], H, D).swapaxes(-3, -2)

        q, k, v = heads(q), heads(k), heads(v)
        # score dtype follows the compute dtype: in bf16 serving the
        # (nW*B, H, 144, 144) score tensor is the backbone's dominant HBM
        # term — writing it bf16 halves that traffic; the softmax still
        # upcasts to f32 (max-subtract and normalization exact), so only
        # the logits themselves round (~2^-8 relative). f32 inputs keep
        # the f32-exact path (converter parity tests run there).
        score_dtype = jnp.float32 if x.dtype == jnp.float32 else x.dtype
        attn = jnp.einsum(
            "...hqd,...hkd->...hqk", q * (D**-0.5), k,
            preferred_element_type=score_dtype,
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, H),
        )
        idx = jnp.asarray(_rel_pos_index(self.window))
        bias = table[idx.reshape(-1)].reshape(Wsq, Wsq, H).transpose(2, 0, 1)
        attn = attn + bias[None].astype(score_dtype)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(-1, nW, H, Wsq, Wsq) + mask[
                None, :, None
            ].astype(score_dtype)
            attn = attn.reshape(-1, H, Wsq, Wsq)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(v.dtype)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = out.swapaxes(-3, -2).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def _window_partition(x, w):
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(wins, w, B, H, W):
    x = wins.reshape(B, H // w, W // w, w, w, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def _shift_mask(H, W, w, shift) -> np.ndarray:
    """Attention mask for shifted windows: (nW, w^2, w^2) additive."""
    img = np.zeros((H, W), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    wins = img.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    diff = wins[:, :, None] != wins[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int = 0
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        w = self.window  # mmdet keeps the window and pads, never shrinks
        shift = self.shift

        y = nn.LayerNorm(name="norm1")(x)
        # mmdet ShiftWindowMSA pads the normed map (zeros) up to window
        # multiples; padded tokens participate in unshifted-window attention
        # (bias-only keys), and the shifted-window mask is built over the
        # PADDED extent — replicated here for conversion parity
        Hp, Wp = -(-H // w) * w, -(-W // w) * w
        if (Hp, Wp) != (H, W):
            y = jnp.pad(y, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_mask(Hp, Wp, w, shift))
        else:
            mask = None
        wins = _window_partition(y, w)
        wins = WindowAttention(self.dim, self.num_heads, w, name="attn")(
            wins, mask
        )
        y = _window_reverse(wins, w, B, Hp, Wp)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = x + y

        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1")(y)
        # exact-erf gelu matches mmdet/torch for f32 converter parity; in
        # bf16 serving the tanh approximation's ~1e-3 error sits below the
        # bf16 rounding already accepted, and erf measured 2x the VPU cost
        # of tanh at stride-4 geometry (tools/bench_swin_parts.py)
        y = nn.gelu(y, approximate=x.dtype == jnp.bfloat16)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        if H % 2 or W % 2:  # mmdet PatchMerging zero-pads odd extents
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
            B, H, W, C = x.shape
        x = x.reshape(B, H // 2, 2, W // 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        # 4C order = (ky, kx, c); mmdet's nn.Unfold emits (c, ky, kx) — the
        # checkpoint converter permutes norm/reduction weights to match
        x = x.reshape(B, H // 2, W // 2, 4 * C)
        x = nn.LayerNorm(name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction")(x)


@BACKBONES.register()
class SwinTransformer(nn.Module):
    embed_dim: int = 128  # Swin-B
    depths: tuple[int, ...] = (2, 2, 18, 2)
    num_heads: tuple[int, ...] = (4, 8, 16, 32)
    window: int = 12
    out_indices: tuple[int, ...] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim, (4, 4), strides=(4, 4), name="patch_embed"
        )(x)
        x = nn.LayerNorm(name="patch_norm")(x)
        outs = []
        dim = self.embed_dim
        for stage, depth in enumerate(self.depths):
            for blk in range(depth):
                x = SwinBlock(
                    dim,
                    self.num_heads[stage],
                    self.window,
                    shift=0 if blk % 2 == 0 else self.window // 2,
                    name=f"stage{stage}_block{blk}",
                )(x)
            if stage in self.out_indices:
                outs.append(
                    nn.LayerNorm(name=f"out_norm{stage}")(x)
                )
            if stage < len(self.depths) - 1:
                dim *= 2
                x = PatchMerging(dim, name=f"merge{stage}")(x)
        return tuple(outs)
