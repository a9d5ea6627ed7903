"""Bilinear point / grid sampling on device.

Replaces torch's CUDA ``grid_sample`` / mmcv ``point_sample`` used for
point-cost mask matching (ref: pairnet/models/relation_heads/pairnet_head.py:
630-638) with a pure-XLA gather+lerp. Convention matches
``grid_sample(align_corners=False, padding_mode='zeros')``: a point p in
[0, 1] maps to pixel coordinate ``p * size - 0.5``; samples outside the image
contribute zero.

Layout is channel-last (TPU friendly); callers vmap over batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def point_sample(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Sample ``feat`` (H, W, C) at ``points`` (..., 2) given as (x, y) in [0, 1].

    Returns (..., C). Zero padding outside the image.
    """
    H, W = feat.shape[0], feat.shape[1]
    pts_shape = points.shape[:-1]
    pts = points.reshape(-1, 2).astype(jnp.float32)

    x = pts[:, 0] * W - 0.5
    y = pts[:, 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xi, yi, w):
        inside = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        flat = feat.reshape(H * W, -1)
        vals = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return vals * (w * inside)[:, None]

    out = (
        corner(x0, y0, wx0 * wy0)
        + corner(x0 + 1, y0, wx1 * wy0)
        + corner(x0, y0 + 1, wx0 * wy1)
        + corner(x0 + 1, y0 + 1, wx1 * wy1)
    )
    return out.reshape(*pts_shape, feat.shape[-1])


def point_sample_batched(feat: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C), (B, ..., 2) -> (B, ..., C)."""
    return jax.vmap(point_sample)(feat, points)


def sample_mask_points(
    masks: jnp.ndarray, points: jnp.ndarray
) -> jnp.ndarray:
    """Sample a stack of masks (N, H, W) at shared points (P, 2) -> (N, P)."""
    feat = jnp.moveaxis(masks, 0, -1)  # (H, W, N)
    return point_sample(feat, points).T  # (N, P)
