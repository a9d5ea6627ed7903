"""Feature Pyramid Network neck (mmdet FPN semantics).

Used by the two-stage frameworks (ref: configs/motifs/*.py neck=FPN over
ResNet C2-C5, out_channels 256, num_outs 5 with an extra max-pool level).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

def nearest_resize(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') for NHWC: floor index mapping
    (mmdet FPN's default upsample_cfg — bilinear here would break weight-
    conversion parity)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    ys = (jnp.arange(h_out) * h_in) // h_out
    xs = (jnp.arange(w_out) * w_in) // w_out
    return x[:, ys][:, :, xs]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        """feats: (C2..C5) NHWC -> (P2..P{num_outs+1}) at strides 4,8,...."""
        n = len(feats)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + nearest_resize(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                name=f"fpn_conv_{i}",
            )(laterals[i])
            for i in range(n)
        ]
        while len(outs) < self.num_outs:
            # extra level: stride-2 max pool of the last (mmdet default)
            x = outs[-1]
            x = jnp.pad(x, ((0, 0), (0, x.shape[1] % 2), (0, x.shape[2] % 2), (0, 0)),
                        constant_values=-jnp.inf)
            outs.append(nn.max_pool(x, (1, 1), strides=(2, 2)))
        return tuple(outs)
