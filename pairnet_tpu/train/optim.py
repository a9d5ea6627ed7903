"""Optimizer assembly: AdamW + paramwise lr multipliers + step LR + clip.

Capability match for the reference's mmcv optimizer stack
(ref: configs/mask2former/pairnet.py:352-372): AdamW(lr 1e-4, wd 1e-4),
``paramwise_cfg`` custom-key lr multipliers (0.1 for backbone /
transformer_decoder / pixel_decoder), norm_decay_mult=0, grad clip
max_norm 0.1 (L2), step LR gamma 0.5 at epochs [5, 10], and
``auto_scale_lr`` by base batch size 8. Frozen stages (ref: pairnet.py:15 —
frozen_stages=1) are expressed as a 0.0 lr multiplier.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(
        str(getattr(k, "key", getattr(k, "idx", k))) for k in path
    )


def lr_mult_tree(params, custom_keys: Mapping[str, float]):
    """Per-leaf lr multiplier: first matching substring in the path wins."""

    def mult(path, _):
        p = _path_str(path)
        for key, m in custom_keys.items():
            if key in p:
                return m
        return 1.0

    return jax.tree_util.tree_map_with_path(mult, params)


def norm_free_decay_mask(params):
    """True where weight decay applies; norm-module {scale, bias} pairs and
    bare 1-d norm 'weight's are excluded (mmcv norm_decay_mult=0)."""

    def is_norm_module(subtree) -> bool:
        if not isinstance(subtree, Mapping):
            return False
        keys = set(subtree.keys())
        return keys == {"scale", "bias"} or keys == {"scale"}

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, Mapping):
                if is_norm_module(v):
                    out[k] = jax.tree_util.tree_map(lambda _: False, dict(v))
                else:
                    out[k] = walk(v)
            else:
                out[k] = True
        return out

    return walk(params)


def step_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs: Sequence[int] = (5, 10),
    gamma: float = 0.5,
) -> optax.Schedule:
    boundaries = {int(e * steps_per_epoch): gamma for e in decay_epochs}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def build_optimizer(
    params,
    base_lr: float = 1e-4,
    weight_decay: float = 1e-4,
    grad_clip: float = 0.1,
    custom_lr_keys: Mapping[str, float] | None = None,
    schedule: optax.Schedule | None = None,
    betas: tuple[float, float] = (0.9, 0.999),
) -> optax.GradientTransformation:
    """AdamW with per-parameter lr multipliers applied to the whole update
    (matching mmcv per-group lr semantics: both the Adam step and the
    decoupled weight decay scale with lr_mult)."""
    if custom_lr_keys is None:
        # reference defaults incl. frozen stem/layer1 (frozen_stages=1)
        custom_lr_keys = {
            "backbone/conv1": 0.0,
            "backbone/bn1": 0.0,
            "backbone/layer1": 0.0,
            "backbone": 0.1,
            "transformer_decoder": 0.1,
            "pixel_decoder": 0.1,
        }
    lr = schedule if schedule is not None else base_lr
    mults = lr_mult_tree(params, custom_lr_keys)
    decay_mask = norm_free_decay_mask(params)

    def scale_by_mults():
        def update_fn(updates, state, params=None):
            return (
                jax.tree_util.tree_map(lambda u, m: u * m, updates, mults),
                state,
            )

        return optax.GradientTransformation(lambda _: optax.EmptyState(), update_fn)

    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(
            lr, b1=betas[0], b2=betas[1], weight_decay=weight_decay,
            mask=decay_mask,
        ),
        scale_by_mults(),
    )
