"""ResNeXt backbone: grouped-bottleneck torch-mirror conversion parity.

Counterpart evidence for the reference's ResNeXt-101 32x8d VG rows
(ref: configs/deformable_detr/od_rnext101_vg.py — mmdet ResNeXt with
groups=32, base_width=8). A plain-torch grouped bottleneck stack with
torchvision naming converts through the UNCHANGED convert_resnet (grouped
conv kernels keep the (kh, kw, in/groups, out) layout under the same
transposition) and must match numerically in eval mode.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from pairnet_tpu.models.backbones.resnet import ResNeXt
from pairnet_tpu.utils.torch_convert import convert_resnet, unflatten


class _TorchXBottleneck(tnn.Module):
    def __init__(self, inplanes, planes, width, groups, stride, downsample):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.conv2 = tnn.Conv2d(
            width, width, 3, stride=stride, padding=1, groups=groups, bias=False
        )
        self.bn2 = tnn.BatchNorm2d(width)
        self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class _TorchTinyResNeXt(tnn.Module):
    """Stem + 4 single-block stages with torchvision resnext naming,
    groups=4, base_width=8 at stem width 16 (the 32x8d structure scaled
    down; width formula planes * base_width / 64 * groups)."""

    def __init__(self, groups=4, base_width=8):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 16, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(16)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        layers = []
        inplanes, planes = 16, 64
        for stage in range(4):
            width = planes * base_width // 64 * groups
            stride = 1 if stage == 0 else 2
            layers.append(
                tnn.Sequential(
                    _TorchXBottleneck(
                        inplanes, planes, width, groups, stride, True
                    )
                )
            )
            inplanes = planes * 4
            planes *= 2
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        c2 = self.layer1(x)
        c3 = self.layer2(c2)
        c4 = self.layer3(c3)
        c5 = self.layer4(c4)
        return c2, c3, c4, c5


def test_resnext_conversion_numeric():
    tmodel = _TorchTinyResNeXt()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)
    tmodel.eval()
    params_flat, consts_flat = convert_resnet(tmodel.state_dict())

    model = ResNeXt(depth=26, groups=4, base_width=8, stem_width=16)
    variables = {
        "params": unflatten(params_flat),
        "constants": unflatten(consts_flat),
    }
    x = np.random.default_rng(0).normal(size=(1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        touts = tmodel(torch.tensor(x))
    jouts = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(jouts) == 4
    for jo, to in zip(jouts, touts):
        np.testing.assert_allclose(
            np.asarray(jo).transpose(0, 3, 1, 2), to.numpy(), atol=3e-4
        )


def test_resnext_builds_from_config():
    from pairnet_tpu.config import load_config
    from pairnet_tpu.train.builder import build_detector

    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("pairnet_rnext101_vg.py", "od_rnext101_vg.py"):
        cfg = load_config(
            os.path.join(repo, "configs", "deformable_detr", name)
        )
        assert cfg.model.backbone.type == "ResNeXt"
        assert cfg.model.backbone.groups == 32
        model = build_detector(cfg)
        assert model.backbone.base_width == 8
