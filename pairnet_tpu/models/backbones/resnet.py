"""ResNet backbone (pytorch-style bottleneck, frozen BN), NHWC.

Capability match for the reference backbone
(ref: configs/mask2former/pairnet.py:9-19 — ResNet-50, out_indices (0,1,2,3),
frozen_stages=1, BN frozen, torchvision init). Weight layout is chosen so a
torchvision checkpoint converts by pure transposition (see
pairnet_tpu/utils/torch_convert.py).

"pytorch style": the stride-2 convolution of a downsampling bottleneck lives
in conv2 (the 3x3), matching torchvision.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import BACKBONES
from pairnet_tpu.models.layers import FrozenBatchNorm


class StemConv(nn.Module):
    """7x7/2 stem conv, space-to-depth formulated — MEASURED NEGATIVE.

    The classic TPU recipe (space-to-depth(2) to (H/2, W/2, 12) + the same
    weights as a 4x4 stride-1 kernel; exact-products parity in
    tests/test_stem_conv.py) was tried against the measured 4.5 ms stem at
    800x1344 batch 4 — and made it 9.2 ms: the input relayout itself is a
    3-channel-minor transpose that costs more than the conv it saves, i.e.
    XLA's own conv layout assignment was already good. The backbones
    therefore keep the plain ``nn.Conv`` stem; this module stays as the
    documented experiment (param tree identical to nn.Conv, so it can be
    re-tried cheaply if a fused relayout path appears).
    """

    features: int

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, C, self.features),
        )
        kernel = kernel.astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        B, H, W, _ = x.shape
        if H % 2 or W % 2:
            return jax.lax.conv_general_dilated(
                x, kernel, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
            )
        # y[p,q] = sum_{dy,dx} W[dy,dx] x[2p-3+dy, 2q-3+dx]; with u = 2U+e,
        # dy = 2k+e-1 for k = U-(p-2) in [0,4): pad W one row/col at the
        # front, then W2[k,l,(e,f,c)] = Wp[2k+e, 2l+f, c]
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k2 = (
            kp.reshape(4, 2, 4, 2, C, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * C, self.features)
        )
        x2 = (
            x.reshape(B, H // 2, 2, W // 2, 2, C)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, H // 2, W // 2, 4 * C)
        )
        dn2 = jax.lax.conv_dimension_numbers(
            x2.shape, k2.shape, ("NHWC", "HWIO", "NHWC")
        )
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1), [(2, 1), (2, 1)], dimension_numbers=dn2
        )


_STAGE_BLOCKS = {
    26: (1, 1, 1, 1),  # minimal bottleneck variant (tests / smoke configs)
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    """torchvision-style bottleneck; ``groups > 1`` + ``width`` turns it
    into the ResNeXt block (grouped 3x3, widened inner channels)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    width: int | None = None  # inner channels; defaults to planes

    @nn.compact
    def __call__(self, x):
        identity = x
        width = self.width or self.planes
        out = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(FrozenBatchNorm(width, name="bn1")(out))
        out = nn.Conv(
            width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            feature_group_count=self.groups,
            name="conv2",
        )(out)
        out = nn.relu(FrozenBatchNorm(width, name="bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(identity)
        return nn.relu(out + identity)


@BACKBONES.register()
class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) at strides (4, 8, 16, 32), NHWC."""

    depth: int = 50
    out_indices: Sequence[int] = (0, 1, 2, 3)
    base_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        blocks = _STAGE_BLOCKS[self.depth]
        x = nn.Conv(
            self.base_width,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            name="conv1",
        )(x)
        x = nn.relu(FrozenBatchNorm(self.base_width, name="bn1")(x))
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        outs = []
        planes = self.base_width
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)


@BACKBONES.register()
class ResNeXt(nn.Module):
    """ResNeXt backbone (grouped bottlenecks), NHWC.

    Counterpart of mmdet's ResNeXt as configured by the reference's VG bbox
    family (ref: configs/deformable_detr/od_rnext101_vg.py — depth 101,
    groups=32, base_width=8, i.e. ResNeXt-101 32x8d). Inner block width =
    planes * base_width / 64 * groups (torchvision formula); weights convert
    from torchvision/mmdet checkpoints by the same pure transposition as
    ResNet (grouped conv kernels keep the (kh, kw, in/groups, out) layout).
    Returns the stages selected by ``out_indices`` at strides (4, 8, 16, 32).
    """

    depth: int = 101
    groups: int = 32
    base_width: int = 8
    out_indices: Sequence[int] = (0, 1, 2, 3)
    stem_width: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        blocks = _STAGE_BLOCKS[self.depth]
        x = nn.Conv(
            self.stem_width,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            name="conv1",
        )(x)
        x = nn.relu(FrozenBatchNorm(self.stem_width, name="bn1")(x))
        x = jnp.pad(
            x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf
        )
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(blocks):
            stride = 1 if stage == 0 else 2
            width = planes * self.base_width // 64 * self.groups
            for b in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    groups=self.groups,
                    width=width,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            if stage in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
