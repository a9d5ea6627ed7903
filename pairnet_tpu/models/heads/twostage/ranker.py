"""Key-relation rankers + weak supervision labels.

Behavioral counterparts of pairnet/models/relation_heads/approaches/
relation_ranker.py: LinearRanker (MLP over union features), LSTMRanker
(sequence scan over union features sorted by union-box x-center), and
``get_weak_key_rel_labels`` — saliency x area importance softmaxed over the
pairs of an image (ref: relation_ranker.py:45-216).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.models.heads.twostage.contexts import MaskedLSTM


class LinearRanker(nn.Module):
    """(B, P, D) union features -> (B, P) key-relation scores."""

    hidden_dim: int = 512
    num_layers: int = 1

    @nn.compact
    def __call__(self, union_feats, pair_valid=None):
        x = union_feats
        for i in range(self.num_layers):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"fc{i}")(x))
        score = nn.Dense(1, name="out")(x)[..., 0]
        if pair_valid is not None:
            score = jnp.where(pair_valid, score, -1e9)
        return score


class LSTMRanker(nn.Module):
    """BiLSTM over pairs sorted by union-box x-center, then a score head."""

    hidden_dim: int = 512

    @nn.compact
    def __call__(self, union_feats, union_boxes, pair_valid):
        cx = (union_boxes[..., 0] + union_boxes[..., 2]) / 2.0
        key = jnp.where(pair_valid, cx, jnp.inf)
        perm = jnp.argsort(key, axis=-1)
        inv = jnp.argsort(perm, axis=-1)
        take = jax.vmap(lambda a, i: a[i])
        x = take(union_feats, perm)
        m = take(pair_valid, perm)
        h = MaskedLSTM(self.hidden_dim, name="lstm")(x, m)
        h = take(h, inv)
        score = nn.Dense(1, name="out")(h)[..., 0]
        return jnp.where(pair_valid, score, -1e9)


def get_weak_key_rel_labels(
    saliency_map: jnp.ndarray,  # (H, W) f32 in [0, 1]
    boxes: jnp.ndarray,  # (N, 4) xyxy pixels
    pairs: jnp.ndarray,  # (P, 2)
    pair_valid: jnp.ndarray,  # (P,)
    comb_factor: float = 0.5,
) -> jnp.ndarray:
    """Weak key-relation targets: per-object importance = comb * mean box
    saliency + (1 - comb) * relative area; per-pair importance = sum of
    endpoints, softmaxed over valid pairs (ref: relation_ranker.py:178-216)."""
    H, W = saliency_map.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]

    def box_stats(b):
        inside = (
            (xs >= b[0]) & (xs <= b[2]) & (ys >= b[1]) & (ys <= b[3])
        ).astype(jnp.float32)
        area = jnp.maximum(inside.sum(), 1.0)
        sal = jnp.sum(saliency_map * inside) / area
        return sal, area / (H * W)

    sal, area = jax.vmap(box_stats)(boxes)
    obj_imp = comb_factor * sal + (1.0 - comb_factor) * area
    pair_imp = obj_imp[pairs[:, 0]] + obj_imp[pairs[:, 1]]
    pair_imp = jnp.where(pair_valid, pair_imp, -1e9)
    return jax.nn.softmax(pair_imp)
