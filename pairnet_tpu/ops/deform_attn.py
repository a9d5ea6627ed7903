"""Multi-scale deformable attention core op.

The reference relies on mmcv's ``MultiScaleDeformableAttention`` CUDA im2col
kernel (ref: SURVEY.md §2.4; used by every Mask2Former pixel decoder and the
Deformable-DETR transformer). This module provides the TPU equivalent:

* :func:`ms_deform_attn` — the mathematical core: fused multi-level bilinear
  gather + attention-weighted reduction. The default path is pure XLA
  (gathers + lerp); a Pallas kernel can be slotted in via ``impl='pallas'``
  once registered (see pairnet_tpu/ops/pallas/).

Semantics match the CUDA kernel: sampling location p in [0, 1] maps to pixel
coordinate ``p * size - 0.5`` per level; out-of-range corners contribute zero.

Shapes (channel-last / TPU layout):
  value:               (B, S, H, D)   S = sum_l h_l * w_l
  spatial_shapes:      static tuple ((h1, w1), ...)
  sampling_locations:  (B, Q, H, L, P, 2)  normalized (x, y)
  attention_weights:   (B, Q, H, L, P)     softmaxed over L*P
Returns:               (B, Q, H * D)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

_PALLAS_IMPL = {}


def register_pallas_impl(name: str, fn) -> None:
    _PALLAS_IMPL[name] = fn


def _level_offsets(spatial_shapes: Sequence[tuple[int, int]]):
    offs = [0]
    for h, w in spatial_shapes:
        offs.append(offs[-1] + h * w)
    return offs


def _sample_level(value_l, loc, h, w):
    """Bilinear-sample one level.

    value_l: (S_l, H, D) flattened level features (row-major h, w).
    loc:     (Q, H, P, 2) normalized (x, y).
    Returns  (Q, H, P, D).
    """
    v_hm = jnp.moveaxis(value_l, 1, 0)  # (H, S_l, D)
    loc_hm = jnp.moveaxis(loc, 1, 0)  # (H, Q, P, 2)

    def one_head(v, lc):  # v (S_l, D), lc (Q, P, 2)
        x = lc[..., 0] * w - 0.5
        y = lc[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0

        def corner(xi, yi, wgt):
            inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            idx = (yi_c * w + xi_c).reshape(-1)  # (Q*P,)
            g = jnp.take(v, idx, axis=0).reshape(*xi.shape, v.shape[-1])
            return g * (wgt * inside)[..., None]

        return (
            corner(x0, y0, (1 - wx1) * (1 - wy1))
            + corner(x0 + 1, y0, wx1 * (1 - wy1))
            + corner(x0, y0 + 1, (1 - wx1) * wy1)
            + corner(x0 + 1, y0 + 1, wx1 * wy1)
        )  # (Q, P, D)

    out = jax.vmap(one_head)(v_hm, loc_hm)  # (H, Q, P, D)
    return jnp.moveaxis(out, 0, 1)  # (Q, H, P, D)


def _ms_deform_attn_single(value, spatial_shapes, loc, weights):
    """Single-image core. value (S, H, D); loc (Q, H, L, P, 2); w (Q, H, L, P)."""
    offs = _level_offsets(spatial_shapes)
    acc = None
    for lvl, (h, w) in enumerate(spatial_shapes):
        v_l = jax.lax.dynamic_slice_in_dim(value, offs[lvl], h * w, axis=0)
        sampled = _sample_level(v_l, loc[:, :, lvl], h, w)  # (Q, H, P, D)
        term = jnp.einsum("qhpd,qhp->qhd", sampled, weights[:, :, lvl])
        acc = term if acc is None else acc + term
    Q, H, D = acc.shape
    return acc.reshape(Q, H * D)


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """Batched multi-scale deformable attention core (see module doc)."""
    spatial_shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if impl in _PALLAS_IMPL:
        return _PALLAS_IMPL[impl](
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return jax.vmap(
        lambda v, l, w: _ms_deform_attn_single(v, spatial_shapes, l, w)
    )(value, sampling_locations, attention_weights)
