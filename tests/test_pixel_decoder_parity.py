"""Full pixel-decoder conversion numerics vs a pure-torch mmdet mirror.

VERDICT r1 #4: the MSDeformAttnPixelDecoder conversion (GN placement, level
embeds, deform-attn offset/weight packing) previously had only name/shape
roundtrip coverage. This file mirrors mmdet 2.25's MSDeformAttnPixelDecoder
semantics in plain torch (grid_sample deform-attn core, ConvModule 1x1-GN
input projections, post-norm encoder layers, bilinear FPN fusion) with
mmdet state-dict naming, and asserts the converted flax module matches to
<= 1e-4. Ref: pairnet/models/relation_heads/pairnet_head.py:88-94 (the
reference builds mmcv's decoder as a plugin).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.necks.pixel_decoder import MSDeformAttnPixelDecoder  # noqa: E402
from pairnet_tpu.utils.torch_convert import convert_pixel_decoder, unflatten  # noqa: E402

torch.manual_seed(0)

C = 32  # embed dims
HEADS = 4
LVLS = 3
PTS = 4
FFN = 64
LAYERS = 2


def sine_pos(h, w, num_feats=C // 2):
    """mmdet SinePositionalEncoding(normalize=True), zero mask."""
    y = torch.arange(1, h + 1, dtype=torch.float32)[:, None].expand(h, w)
    x = torch.arange(1, w + 1, dtype=torch.float32)[None, :].expand(h, w)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x[..., None] / dim_t
    pos_y = y[..., None] / dim_t
    pos_x = torch.stack(
        (pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=3
    ).flatten(2)
    pos_y = torch.stack(
        (pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=3
    ).flatten(2)
    return torch.cat((pos_y, pos_x), dim=2).permute(2, 0, 1)  # (C, h, w)


def ms_deform_attn_torch(value, spatial_shapes, locs, attn):
    """mmcv multi_scale_deformable_attn_pytorch (grid_sample core).

    value (B, S, H, D); locs (B, Q, H, L, P, 2); attn (B, Q, H, L, P).
    """
    B, S, H, D = value.shape
    Q = locs.shape[1]
    splits = [h * w for h, w in spatial_shapes]
    values = value.split(splits, dim=1)
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = values[lvl].flatten(2).transpose(1, 2).reshape(B * H, D, h, w)
        grid = 2 * locs[:, :, :, lvl] - 1  # (B, Q, H, P, 2)
        grid = grid.transpose(1, 2).flatten(0, 1)  # (B*H, Q, P, 2)
        out.append(
            F.grid_sample(
                v, grid, mode="bilinear", padding_mode="zeros",
                align_corners=False,
            )
        )  # (B*H, D, Q, P)
    out = torch.stack(out, dim=-2)  # (B*H, D, Q, L, P)
    aw = attn.transpose(1, 2).reshape(B * H, 1, Q, LVLS * PTS)
    res = (out.flatten(-2) * aw).sum(-1)  # (B*H, D, Q)
    return res.view(B, H * D, Q).transpose(1, 2)


class _MSDeformAttn(tnn.Module):
    def __init__(self):
        super().__init__()
        self.sampling_offsets = tnn.Linear(C, HEADS * LVLS * PTS * 2)
        self.attention_weights = tnn.Linear(C, HEADS * LVLS * PTS)
        self.value_proj = tnn.Linear(C, C)
        self.output_proj = tnn.Linear(C, C)

    def forward(self, query, ref, spatial_shapes, query_pos):
        B, Q, _ = query.shape
        identity = query
        q = query + query_pos
        value = self.value_proj(query).view(B, Q, HEADS, C // HEADS)
        offsets = self.sampling_offsets(q).view(B, Q, HEADS, LVLS, PTS, 2)
        attn = self.attention_weights(q).view(B, Q, HEADS, LVLS * PTS)
        attn = attn.softmax(-1).view(B, Q, HEADS, LVLS, PTS)
        normalizer = torch.tensor(
            [[w, h] for h, w in spatial_shapes], dtype=torch.float32
        )
        locs = ref[:, :, None, :, None, :] + offsets / normalizer[
            None, None, None, :, None, :
        ]
        out = ms_deform_attn_torch(value, spatial_shapes, locs, attn)
        return identity + self.output_proj(out)


class _EncoderLayer(tnn.Module):
    """mmcv DetrTransformerEncoderLayer: self_attn -> norm -> ffn -> norm."""

    def __init__(self):
        super().__init__()
        self.attentions = tnn.ModuleList([_MSDeformAttn()])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C), tnn.LayerNorm(C)])
        fc1 = tnn.Sequential(tnn.Linear(C, FFN), tnn.ReLU())
        self.ffns = tnn.ModuleList(
            [tnn.Sequential()]
        )
        self.ffns[0].layers = tnn.Sequential(fc1, tnn.Linear(FFN, C))

    def forward(self, x, ref, spatial_shapes, pos):
        x = self.attentions[0](x, ref, spatial_shapes, pos)
        x = self.norms[0](x)
        x = x + self.ffns[0].layers(x)
        return self.norms[1](x)


class _ConvModule(tnn.Module):
    def __init__(self, cin, k, act=False):
        super().__init__()
        self.conv = tnn.Conv2d(cin, C, k, padding=k // 2)
        self.gn = tnn.GroupNorm(32 if C % 32 == 0 else 4, C)
        self.act = act

    def forward(self, x):
        x = self.gn(self.conv(x))
        return F.relu(x) if self.act else x


class _TorchPixelDecoder(tnn.Module):
    """mmdet MSDeformAttnPixelDecoder mirror, mmdet naming."""

    def __init__(self, in_channels):
        super().__init__()
        self.input_convs = tnn.ModuleList(
            [_ConvModule(in_channels[-1 - i], 1) for i in range(LVLS)]
        )
        self.encoder = tnn.Module()
        self.encoder.layers = tnn.ModuleList(
            [_EncoderLayer() for _ in range(LAYERS)]
        )
        self.level_encoding = tnn.Embedding(LVLS, C)
        self.lateral_convs = tnn.ModuleList([_ConvModule(in_channels[0], 1)])
        self.output_convs = tnn.ModuleList([_ConvModule(C, 3, act=True)])
        self.mask_feature = tnn.Conv2d(C, C, 3, padding=1)

    def forward(self, feats):
        B = feats[0].shape[0]
        n_in = len(feats)
        tokens = []
        pos_list = []
        shapes = []
        refs = []
        for i in range(LVLS):
            f = self.input_convs[i](feats[n_in - 1 - i])
            h, w = f.shape[-2:]
            # mmdet: level embed is added to the positional encoding
            pos = sine_pos(h, w) + self.level_encoding.weight[i].view(-1, 1, 1)
            tokens.append(f.flatten(2).transpose(1, 2))
            pos_list.append(pos.flatten(1).transpose(0, 1)[None])
            shapes.append((h, w))
            ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
            xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
            yy, xx = torch.meshgrid(ys, xs, indexing="ij")
            refs.append(torch.stack([xx, yy], -1).reshape(-1, 2))
        x = torch.cat(tokens, 1)
        pos = torch.cat(pos_list, 1).expand(B, -1, -1)
        ref = torch.cat(refs, 0)[None, :, None, :].expand(B, -1, LVLS, -1)
        for layer in self.encoder.layers:
            x = layer(x, ref, shapes, pos)
        outs = []
        start = 0
        for h, w in shapes:
            outs.append(
                x[:, start : start + h * w].transpose(1, 2).reshape(B, C, h, w)
            )
            start += h * w
        y = outs[-1]
        lat = self.lateral_convs[0](feats[0])
        y = lat + F.interpolate(
            y, size=lat.shape[-2:], mode="bilinear", align_corners=False
        )
        y = self.output_convs[0](y)
        return self.mask_feature(y), outs


def test_pixel_decoder_conversion_numeric():
    in_channels = [8, 12, 16, 24]  # C2..C5
    tm = _TorchPixelDecoder(in_channels)
    tm.eval()
    sd = tm.state_dict()
    flat = convert_pixel_decoder(sd, "")
    params = unflatten(flat)

    jm = MSDeformAttnPixelDecoder(
        feat_channels=C, out_channels=C, num_encoder_levels=LVLS,
        num_encoder_layers=LAYERS, num_heads=HEADS,
        feedforward_channels=FFN,
    )
    rng = np.random.default_rng(0)
    feats_np = [
        rng.normal(size=(2, ci, 32 // (2 ** i), 48 // (2 ** i))).astype(
            np.float32
        )
        for i, ci in enumerate(in_channels)
    ]
    with torch.no_grad():
        t_mask, t_outs = tm([torch.tensor(f) for f in feats_np])

    j_feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    j_mask, j_outs = jm.apply({"params": params}, j_feats)
    np.testing.assert_allclose(
        np.asarray(j_mask).transpose(0, 3, 1, 2), t_mask.numpy(), atol=1e-4
    )
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j).transpose(0, 3, 1, 2).reshape(t.shape),
            t.numpy(), atol=1e-4,
        )
