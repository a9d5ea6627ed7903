"""PanopticFPN weight-conversion numerics vs pure-torch mmdet mirrors.

VERDICT r2 #2: the two-stage baselines (MOTIFS/VCTree/IMP/GPS-Net) freeze a
*pretrained* mmdet PanopticFPN (ref: configs/motifs/
panoptic_fpn_r50_fpn_1x_predcls_psg.py load_from); without a converter their
baseline-table numbers are unreachable. This file mirrors the mmdet 2.25
submodules in plain torch with mmdet state-dict naming — FPN (nearest
top-down), RPN head, Shared2FCBBoxHead (channel-first roi flatten),
FCNMaskHead (deconv), PanopticFPNHead (ConvUpsample + GN) — and asserts
each converted flax module matches to <= 1e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.frameworks.panoptic_fpn import (  # noqa: E402
    BBoxHead,
    MaskHead,
    RPNHead,
    SemanticHead,
)
from pairnet_tpu.models.necks.fpn import FPN  # noqa: E402
from pairnet_tpu.utils.torch_convert import convert_panoptic_fpn  # noqa: E402

torch.manual_seed(0)
C = 16  # FPN channels (tiny for speed)
THINGS, STUFF = 5, 4
FC = 32


def _bn_free_resnet_sd():
    """Minimal fake backbone entries so convert_panoptic_fpn's resnet pass
    has something to chew on (the resnet converter itself is covered by
    test_torch_convert)."""
    sd = {}
    sd["backbone.conv1.weight"] = torch.randn(4, 3, 7, 7)
    for k in ("weight", "bias", "running_mean", "running_var"):
        sd[f"backbone.bn1.{k}"] = torch.rand(4) + 0.1
    return sd


class TorchFPN(tnn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.lateral_convs = tnn.ModuleList()
        self.fpn_convs = tnn.ModuleList()
        for ci in in_channels:
            lat = tnn.Module()
            lat.conv = tnn.Conv2d(ci, C, 1)
            self.lateral_convs.append(lat)
            fpn = tnn.Module()
            fpn.conv = tnn.Conv2d(C, C, 3, padding=1)
            self.fpn_convs.append(fpn)

    def forward(self, feats):
        lats = [l.conv(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(len(lats) - 1, 0, -1):
            lats[i - 1] = lats[i - 1] + F.interpolate(
                lats[i], size=lats[i - 1].shape[-2:], mode="nearest"
            )
        outs = [self.fpn_convs[i].conv(lats[i]) for i in range(len(lats))]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs


class TorchRPN(tnn.Module):
    def __init__(self, a=3):
        super().__init__()
        self.rpn_conv = tnn.Conv2d(C, C, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(C, a, 1)
        self.rpn_reg = tnn.Conv2d(C, a * 4, 1)

    def forward(self, feats):
        outs = []
        for f in feats:
            x = F.relu(self.rpn_conv(f))
            outs.append((self.rpn_cls(x), self.rpn_reg(x)))
        return outs


class TorchBBoxHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.shared_fcs = tnn.ModuleList(
            [tnn.Linear(C * 7 * 7, FC), tnn.Linear(FC, FC)]
        )
        self.fc_cls = tnn.Linear(FC, THINGS + 1)
        self.fc_reg = tnn.Linear(FC, THINGS * 4)

    def forward(self, roi):  # (N, C, 7, 7)
        x = roi.flatten(1)
        for fc in self.shared_fcs:
            x = F.relu(fc(x))
        return self.fc_cls(x), self.fc_reg(x)


class TorchMaskHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleList()
        for i in range(4):
            m = tnn.Module()
            m.conv = tnn.Conv2d(C, C, 3, padding=1)
            self.convs.append(m)
        self.upsample = tnn.ConvTranspose2d(C, C, 2, stride=2)
        self.conv_logits = tnn.Conv2d(C, THINGS, 1)

    def forward(self, x):  # (N, C, 14, 14)
        for m in self.convs:
            x = F.relu(m.conv(x))
        x = F.relu(self.upsample(x))
        return self.conv_logits(x)


class TorchConvUpsample(tnn.Module):
    def __init__(self, num_layers, num_upsample, inner):
        super().__init__()
        self.num_layers, self.num_upsample = num_layers, num_upsample
        self.conv = tnn.ModuleList()
        cin = C
        for _ in range(num_layers):
            m = tnn.Module()
            m.conv = tnn.Conv2d(cin, inner, 3, padding=1, bias=False)
            m.gn = tnn.GroupNorm(min(32, inner), inner)
            self.conv.append(m)
            cin = inner

    def forward(self, x):
        up = self.num_upsample
        for m in self.conv:
            x = F.relu(m.gn(m.conv(x)))
            if up > 0:
                up -= 1
                x = F.interpolate(
                    x, scale_factor=2, mode="bilinear", align_corners=False
                )
        return x


class TorchSemanticHead(tnn.Module):
    def __init__(self, inner=8):
        super().__init__()
        self.conv_upsample_layers = tnn.ModuleList(
            [
                TorchConvUpsample(max(1, i), i, inner)
                for i in range(4)
            ]
        )
        self.conv_logits = tnn.Conv2d(inner, STUFF + 1, 1)

    def forward(self, feats):
        acc = None
        for i, f in enumerate(feats[:4]):
            x = self.conv_upsample_layers[i](f)
            acc = x if acc is None else acc + x
        return self.conv_logits(acc)


@pytest.fixture(scope="module")
def converted():
    """One fake mmdet PanopticFPN state dict + its converted variables."""
    fpn = TorchFPN([4, 6, 8, 10])
    rpn = TorchRPN()
    bbox = TorchBBoxHead()
    mask = TorchMaskHead()
    sem = TorchSemanticHead()
    sd = _bn_free_resnet_sd()
    sd.update({f"neck.{k}": v for k, v in fpn.state_dict().items()})
    sd.update({f"rpn_head.{k}": v for k, v in rpn.state_dict().items()})
    sd.update({f"roi_head.bbox_head.{k}": v for k, v in bbox.state_dict().items()})
    sd.update({f"roi_head.mask_head.{k}": v for k, v in mask.state_dict().items()})
    sd.update({f"semantic_head.{k}": v for k, v in sem.state_dict().items()})
    out = convert_panoptic_fpn(sd)
    return fpn, rpn, bbox, mask, sem, out["params"]


def test_fpn_parity(converted):
    fpn, *_, params = converted
    rng = np.random.default_rng(0)
    feats = [
        rng.normal(size=(2, ci, 16 // (2**i), 24 // (2**i))).astype(np.float32)
        for i, ci in enumerate([4, 6, 8, 10])
    ]
    with torch.no_grad():
        t_outs = fpn([torch.tensor(f) for f in feats])
    jm = FPN(out_channels=C, num_outs=5)
    j_outs = jm.apply(
        {"params": params["neck"]},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
    )
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j).transpose(0, 3, 1, 2), t.numpy(), atol=1e-4
        )


def test_rpn_parity(converted):
    _, rpn, *_, params = converted
    rng = np.random.default_rng(1)
    feats = [rng.normal(size=(2, C, 8, 12)).astype(np.float32)]
    with torch.no_grad():
        (t_cls, t_reg), = rpn([torch.tensor(f) for f in feats])
    jm = RPNHead(channels=C)
    (j_cls, j_reg), = jm.apply(
        {"params": params["rpn_head"]},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
    )
    np.testing.assert_allclose(
        np.asarray(j_cls).transpose(0, 3, 1, 2), t_cls.numpy(), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_reg).transpose(0, 3, 1, 2), t_reg.numpy(), atol=1e-4
    )


def test_bbox_head_parity(converted):
    *_, bbox, _, _, params = converted
    rng = np.random.default_rng(2)
    roi = rng.normal(size=(5, C, 7, 7)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_reg = bbox(torch.tensor(roi))
    jm = BBoxHead(num_classes=THINGS, fc_dim=FC)
    j_cls, j_reg = jm.apply(
        {"params": params["bbox_head"]}, jnp.asarray(roi.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(), atol=1e-4)


def test_mask_head_parity(converted):
    *_, mask, _, params = converted
    rng = np.random.default_rng(3)
    roi = rng.normal(size=(3, C, 14, 14)).astype(np.float32)
    with torch.no_grad():
        t_out = mask(torch.tensor(roi))
    jm = MaskHead(num_classes=THINGS, channels=C)
    j_out = jm.apply(
        {"params": params["mask_head"]}, jnp.asarray(roi.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=1e-4
    )


def test_semantic_head_parity(converted):
    *_, sem, params = converted
    rng = np.random.default_rng(4)
    feats = [
        rng.normal(size=(2, C, 16 // (2**i), 24 // (2**i))).astype(np.float32)
        for i in range(4)
    ]
    with torch.no_grad():
        t_out = sem([torch.tensor(f) for f in feats])
    jm = SemanticHead(num_stuff=STUFF, inner_channels=8)
    j_out = jm.apply(
        {"params": params["semantic_head"]},
        [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats],
    )
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out.numpy(), atol=1e-4
    )


def test_faster_rcnn_subset_converts():
    """A Faster R-CNN checkpoint (no mask_head / semantic_head — the
    SceneGraphRCNN VG detector, ref frameworks/sg_rcnn.py) converts to the
    box-only parameter subset without error."""
    fpn = TorchFPN([4, 6, 8, 10])
    rpn = TorchRPN()
    bbox = TorchBBoxHead()
    sd = _bn_free_resnet_sd()
    sd.update({f"neck.{k}": v for k, v in fpn.state_dict().items()})
    sd.update({f"rpn_head.{k}": v for k, v in rpn.state_dict().items()})
    sd.update(
        {f"roi_head.bbox_head.{k}": v for k, v in bbox.state_dict().items()}
    )
    out = convert_panoptic_fpn(sd)
    params = out["params"]
    assert "rpn_head" in params and "bbox_head" in params
    assert "mask_head" not in params and "semantic_head" not in params
