"""StemConv space-to-depth formulation: exact-products parity.

The s2d stem must reproduce the plain 7x7/2 conv (same weights) to float
tolerance on even inputs, fall back identically on odd inputs, and keep the
nn.Conv-compatible param tree so torchvision checkpoints convert unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from pairnet_tpu.models.backbones.resnet import StemConv


def _plain(x, kernel):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x, kernel, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn
    )


def test_s2d_matches_plain_conv_and_torch():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 96, 3)), jnp.float32)
    m = StemConv(16, name="conv1")
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    ref = _plain(x, v["params"]["kernel"])
    assert y.shape == ref.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)

    ty = F.conv2d(
        torch.tensor(np.asarray(x).transpose(0, 3, 1, 2)),
        torch.tensor(
            np.asarray(v["params"]["kernel"]).transpose(3, 2, 0, 1)
        ),
        stride=2,
        padding=3,
    )
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ty.numpy(), atol=1e-4
    )


def test_s2d_odd_input_fallback():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 63, 95, 3)), jnp.float32)
    m = StemConv(8)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    ref = _plain(x, v["params"]["kernel"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-5)
