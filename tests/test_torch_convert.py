"""Weight-converter parity: torch modules vs converted flax modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from pairnet_tpu.models.decoders.mask2former_decoder import DecoderLayer  # noqa: E402
from pairnet_tpu.models.layers import MultiheadAttention  # noqa: E402
from pairnet_tpu.utils.torch_convert import (  # noqa: E402
    _mha,
    convert_resnet,
    unflatten,
)

torch.manual_seed(0)


def test_mha_parity():
    C, H, B, Lq, Lk = 32, 4, 2, 7, 11
    tm = tnn.MultiheadAttention(C, H, batch_first=True)
    tm.eval()
    sd = {f"attn.{k}": v for k, v in tm.state_dict().items()}
    flat = {}
    _mha(flat, "m", sd, "attn")
    params = unflatten(flat)["m"]

    q = np.random.default_rng(0).normal(size=(B, Lq, C)).astype(np.float32)
    k = np.random.default_rng(1).normal(size=(B, Lk, C)).astype(np.float32)
    v = np.random.default_rng(2).normal(size=(B, Lk, C)).astype(np.float32)

    with torch.no_grad():
        ref, _ = tm(torch.tensor(q), torch.tensor(k), torch.tensor(v))

    ours = MultiheadAttention(C, H).apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


def test_mha_with_bool_mask_parity():
    C, H, B, Lq, Lk = 16, 2, 1, 5, 9
    tm = tnn.MultiheadAttention(C, H, batch_first=True)
    tm.eval()
    sd = {f"attn.{k}": v for k, v in tm.state_dict().items()}
    flat = {}
    _mha(flat, "m", sd, "attn")
    params = unflatten(flat)["m"]

    rng = np.random.default_rng(3)
    q = rng.normal(size=(B, Lq, C)).astype(np.float32)
    kv = rng.normal(size=(B, Lk, C)).astype(np.float32)
    mask = rng.uniform(size=(Lq, Lk)) > 0.6  # True = not attended

    with torch.no_grad():
        ref, _ = tm(
            torch.tensor(q), torch.tensor(kv), torch.tensor(kv),
            attn_mask=torch.tensor(mask),
        )
    ours = MultiheadAttention(C, H).apply(
        {"params": params},
        jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
        attn_mask=jnp.asarray(mask)[None, None],
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)


class _TorchBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchTinyResNet(tnn.Module):
    """Stem + 2-stage, 1-block-each "ResNet" with torchvision naming."""

    def __init__(self, w=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, w, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = tnn.Sequential(_TorchBottleneck(w, w, 1, True))
        self.layer2 = tnn.Sequential(_TorchBottleneck(w * 4, w * 2, 2, True))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        return c2, c3


def test_resnet_conversion_numeric():
    """Converted stem+bottleneck outputs match torch in eval mode (frozen BN)."""
    from flax import linen as nn

    from pairnet_tpu.models.backbones.resnet import Bottleneck
    from pairnet_tpu.models.layers import FrozenBatchNorm

    tmodel = _TorchTinyResNet(w=8)
    # randomize BN stats so the test actually exercises them
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    tmodel.eval()
    sd = tmodel.state_dict()
    params_flat, consts_flat = convert_resnet(sd)

    class _JaxTiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, name="conv1")(x)
            x = nn.relu(FrozenBatchNorm(8, name="bn1")(x))
            x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            c2 = Bottleneck(8, stride=1, downsample=True, name="layer1_0")(x)
            c3 = Bottleneck(16, stride=2, downsample=True, name="layer2_0")(c2)
            return c2, c3

    x = np.random.default_rng(0).normal(size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tc2, tc3 = tmodel(torch.tensor(x))

    variables = {
        "params": unflatten(params_flat),
        "constants": unflatten(consts_flat),
    }
    jc2, jc3 = _JaxTiny().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(jc2).transpose(0, 3, 1, 2), tc2.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(jc3).transpose(0, 3, 1, 2), tc3.numpy(), atol=2e-4
    )


def test_decoder_layer_parity_vs_torch():
    """Full post-norm decoder layer (cross->self->ffn) matches a torch build."""
    C, H, FF = 16, 2, 32
    B, Q, S = 1, 4, 6

    class TorchLayer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.cross = tnn.MultiheadAttention(C, H, batch_first=True)
            self.self_ = tnn.MultiheadAttention(C, H, batch_first=True)
            self.n1 = tnn.LayerNorm(C)
            self.n2 = tnn.LayerNorm(C)
            self.n3 = tnn.LayerNorm(C)
            self.fc1 = tnn.Linear(C, FF)
            self.fc2 = tnn.Linear(FF, C)

        def forward(self, q, qpos, mem, mpos):
            x = q + self.cross(q + qpos, mem + mpos, mem)[0]
            x = self.n1(x)
            x = x + self.self_(x + qpos, x + qpos, x)[0]
            x = self.n2(x)
            x = x + self.fc2(torch.relu(self.fc1(x)))
            return self.n3(x)

    tl = TorchLayer()
    tl.eval()
    sd = tl.state_dict()
    flat = {}
    _mha(flat, "cross_attn", sd, "cross")
    _mha(flat, "self_attn", sd, "self_")
    for tname, jname in (("n1", "norm1"), ("n2", "norm2"), ("n3", "norm3")):
        flat[f"{jname}/scale"] = sd[f"{tname}.weight"].numpy()
        flat[f"{jname}/bias"] = sd[f"{tname}.bias"].numpy()
    for tname, jname in (("fc1", "ffn/fc1"), ("fc2", "ffn/fc2")):
        flat[f"{jname}/kernel"] = sd[f"{tname}.weight"].numpy().T
        flat[f"{jname}/bias"] = sd[f"{tname}.bias"].numpy()
    params = unflatten(flat)

    rng = np.random.default_rng(0)
    q = rng.normal(size=(B, Q, C)).astype(np.float32)
    qpos = rng.normal(size=(1, Q, C)).astype(np.float32)
    mem = rng.normal(size=(B, S, C)).astype(np.float32)
    mpos = rng.normal(size=(1, S, C)).astype(np.float32)

    with torch.no_grad():
        ref = tl(
            torch.tensor(q), torch.tensor(qpos),
            torch.tensor(mem), torch.tensor(mpos),
        )
    ours = DecoderLayer(C, H, FF).apply(
        {"params": params},
        jnp.asarray(q), jnp.asarray(qpos), jnp.asarray(mem), jnp.asarray(mpos),
        None,
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)
