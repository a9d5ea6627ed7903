"""Matrix Learner variants for the Pair Proposal Network.

The PPN refines the raw query-query affinity matrix with a small CNN
("Matrix Learner"). Behavioral counterparts of
pairnet/models/frameworks/cnn_factory.py (ConvTiny/ConvSmall/ConvBase,
factory creat_cnn) and the ablation variants attn.py / fc.py.

All operate on (B, Q, Q) affinity logits and return the same shape.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.models.layers import MultiheadAttention


class ConvTiny(nn.Module):
    """3x conv7x7 (1->64->64->1), ReLU between; ~0.2M params
    (ref: cnn_factory.py:6-53, the default 'conv_tiny' mapper)."""

    mid_channels: int = 64
    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):  # (B, Q, Q)
        k = self.kernel_size
        pad = [(3, 3), (3, 3)]
        y = x[..., None]
        y = nn.relu(nn.Conv(self.mid_channels, (k, k), padding=pad, name="conv0")(y))
        y = nn.relu(nn.Conv(self.mid_channels, (k, k), padding=pad, name="conv1")(y))
        y = nn.Conv(1, (k, k), padding=pad, name="conv2")(y)
        return y[..., 0]


class ConvSmall(nn.Module):
    """ConvNeXt-like block with residual, ~2M params (ref: cnn_factory.py:55-100)."""

    dim: int = 96

    @nn.compact
    def __call__(self, x):
        y = x[..., None]
        inp = y
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)], name="in_conv")(y)
        y = nn.Conv(
            self.dim,
            (7, 7),
            padding=[(3, 3), (3, 3)],
            feature_group_count=self.dim,
            name="dwconv",
        )(y)
        y = nn.LayerNorm(name="norm")(y)
        y = nn.Conv(4 * self.dim, (1, 1), name="pwconv1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Conv(self.dim, (1, 1), name="pwconv2")(y)
        y = nn.Conv(1, (7, 7), padding=[(3, 3), (3, 3)], name="out_conv")(y)
        return (y + inp)[..., 0]


class ConvBase(nn.Module):
    """Small U-Net, ~31M params (ref: cnn_factory.py ConvBase)."""

    base: int = 64

    @nn.compact
    def __call__(self, x):
        def block(z, ch, name):
            z = nn.Conv(ch, (3, 3), padding="SAME", name=f"{name}_c1")(z)
            z = nn.relu(nn.GroupNorm(num_groups=8, name=f"{name}_gn")(z))
            z = nn.Conv(ch, (3, 3), padding="SAME", name=f"{name}_c2")(z)
            return nn.relu(z)

        y = x[..., None]
        d1 = block(y, self.base, "down1")
        p1 = nn.avg_pool(d1, (2, 2), strides=(2, 2))
        d2 = block(p1, self.base * 2, "down2")
        p2 = nn.avg_pool(d2, (2, 2), strides=(2, 2))
        mid = block(p2, self.base * 4, "mid")
        u2 = jnp.repeat(jnp.repeat(mid, 2, axis=1), 2, axis=2)
        u2 = block(jnp.concatenate([u2[:, : d2.shape[1], : d2.shape[2]], d2], -1), self.base * 2, "up2")
        u1 = jnp.repeat(jnp.repeat(u2, 2, axis=1), 2, axis=2)
        u1 = block(jnp.concatenate([u1[:, : d1.shape[1], : d1.shape[2]], d1], -1), self.base, "up1")
        return nn.Conv(1, (1, 1), name="out")(u1)[..., 0]


class AttnMapper(nn.Module):
    """Dual-axis transformer ablation (ref: frameworks/attn.py:6-31)."""

    dim: int = 64
    num_heads: int = 4

    @nn.compact
    def __call__(self, x):  # (B, Q, Q)
        B, Q, _ = x.shape
        y = nn.Dense(self.dim, name="in_proj")(x[..., None])  # (B, Q, Q, d)
        rows = y.reshape(B * Q, Q, self.dim)
        rows = rows + MultiheadAttention(self.dim, self.num_heads, name="row_attn")(
            rows, rows, rows
        )
        y = rows.reshape(B, Q, Q, self.dim).transpose(0, 2, 1, 3).reshape(B * Q, Q, self.dim)
        y = y + MultiheadAttention(self.dim, self.num_heads, name="col_attn")(y, y, y)
        y = y.reshape(B, Q, Q, self.dim).transpose(0, 2, 1, 3)
        return nn.Dense(1, name="out_proj")(y)[..., 0]


class FCMapper(nn.Module):
    """7-layer MLP over flattened affinity rows (ref: frameworks/fc.py:29-52)."""

    hidden: int = 512
    num_layers: int = 7

    @nn.compact
    def __call__(self, x):  # (B, Q, Q)
        Q = x.shape[-1]
        y = x
        for i in range(self.num_layers - 1):
            y = nn.relu(nn.Dense(self.hidden, name=f"fc{i}")(y))
        return nn.Dense(Q, name=f"fc{self.num_layers - 1}")(y)


MAPPERS = {
    "conv_tiny": ConvTiny,
    "conv_small": ConvSmall,
    "conv_base": ConvBase,
    "attn": AttnMapper,
    "fc": FCMapper,
}


def create_mapper(name: str, **kwargs) -> nn.Module:
    """Factory mirroring creat_cnn (ref: cnn_factory.py:196-204)."""
    if name not in MAPPERS:
        raise KeyError(f"unknown matrix learner '{name}', have {sorted(MAPPERS)}")
    return MAPPERS[name](**kwargs)
