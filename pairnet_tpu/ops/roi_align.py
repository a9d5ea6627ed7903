"""RoIAlign on device (mmcv/Detectron2 semantics: aligned=True).

Replaces mmcv's CUDA RoIAlign used by the two-stage RoI/union extractors
(ref: pairnet/models/relation_heads/roi_extractors/visual_spatial.py:212-220)
with an XLA gather+lerp formulation: for each output bin, ``sampling_ratio``^2
regular sample points, bilinear-interpolated and averaged.

Also provides the mmdet SingleRoIExtractor FPN level mapping
(ref: visual_spatial.py:222-243): level = floor(log2(sqrt(area)/finest_scale
x stride_0)) clamped to the available levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pairnet_tpu.ops.sampling import point_sample


def roi_align(
    feat: jnp.ndarray,  # (H, W, C)
    rois: jnp.ndarray,  # (N, 4) xyxy in IMAGE pixels
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """-> (N, output_size, output_size, C). aligned=True (half-pixel offset)."""
    H, W, C = feat.shape
    N = rois.shape[0]
    s = sampling_ratio
    P = output_size

    boxes = rois.astype(jnp.float32) * spatial_scale - 0.5  # aligned=True
    x0, y0, x1, y1 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    bin_w = jnp.maximum(x1 - x0, 1e-6) / P
    bin_h = jnp.maximum(y1 - y0, 1e-6) / P

    # sample grid: (P*s) points per axis at bin-interior offsets
    grid = (jnp.arange(P * s, dtype=jnp.float32) + 0.5) / s  # in bin units
    xs = x0[:, None] + grid[None, :] * bin_w[:, None]  # (N, P*s)
    ys = y0[:, None] + grid[None, :] * bin_h[:, None]

    # normalized coords for point_sample's align_corners=False convention:
    # pixel coordinate p maps from normalized (p + 0.5) / size
    px = (xs + 0.5) / W
    py = (ys + 0.5) / H
    pts = jnp.stack(
        [
            jnp.broadcast_to(px[:, None, :], (N, P * s, P * s)),
            jnp.broadcast_to(py[:, :, None], (N, P * s, P * s)),
        ],
        axis=-1,
    )  # (N, P*s, P*s, 2) as (x, y)
    sampled = point_sample(feat, pts.reshape(N, -1, 2)).reshape(
        N, P * s, P * s, C
    )
    # average s x s samples per bin
    sampled = sampled.reshape(N, P, s, P, s, C)
    return sampled.mean(axis=(2, 4))


def map_rois_to_levels(
    rois: jnp.ndarray, num_levels: int, finest_scale: int = 56
) -> jnp.ndarray:
    """mmdet SingleRoIExtractor.map_roi_levels: scale-based FPN level.

    target_lvls = floor(log2(sqrt(area) / finest_scale + 1e-6)), clamped.
    """
    scale = jnp.sqrt(
        jnp.clip(rois[:, 2] - rois[:, 0], 0) * jnp.clip(rois[:, 3] - rois[:, 1], 0)
    )
    lvls = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvls, 0, num_levels - 1).astype(jnp.int32)


def multilevel_roi_align(
    feats: list[jnp.ndarray],  # per-level (H_l, W_l, C), strides aligned
    strides: tuple[int, ...],
    rois: jnp.ndarray,  # (N, 4) xyxy image pixels
    output_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: int = 56,
) -> jnp.ndarray:
    """FPN RoIAlign: sample every level, select per-roi by mapped level."""
    lvls = map_rois_to_levels(rois, len(feats), finest_scale)
    outs = [
        roi_align(f, rois, 1.0 / s, output_size, sampling_ratio)
        for f, s in zip(feats, strides)
    ]
    stacked = jnp.stack(outs)  # (L, N, P, P, C)
    return jnp.take_along_axis(
        stacked, lvls[None, :, None, None, None], axis=0
    )[0]
