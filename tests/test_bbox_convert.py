"""CrossHeadBBox (Deformable-DETR family) conversion numerics vs torch.

VERDICT r2 #2: the VG bbox path warm-starts a trained Deformable-DETR
(ref: configs/deformable_detr/pairnet_r101_vg.py:357 load_from). This file
mirrors the mmdet/mmcv submodules in plain torch with reference state-dict
naming — ChannelMapper, DeformableDetrTransformerDecoderLayer (torch MHA
self-attn + 4-dim-box-reference deformable cross-attn + post-norm FFN), and
the RMSNorm/chunked-SwiGLU pre-norm relation decoder layer
(ref: pairnet/models/frameworks/fc.py:7-26, pairnet_bbox_head.py:307-318) —
asserts converted numerics <= 2e-4, and checks the full converted tree
merges into a tiny CrossHeadBBox init (name/shape completeness).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.heads.pairnet_bbox_head import (  # noqa: E402
    ChannelMapper,
    CrossHeadBBox,
    DeformableDecoderLayer,
    RelationFusionLayerRMS,
)
from pairnet_tpu.utils.torch_convert import (  # noqa: E402
    convert_crosshead_bbox,
    unflatten,
)

torch.manual_seed(0)
C = 32
HEADS = 4
LVLS = 4
PTS = 4
FFN = 64


class TorchChannelMapper(tnn.Module):
    def __init__(self, in_channels):
        super().__init__()
        self.convs = tnn.ModuleList()
        for ci in in_channels:
            m = tnn.Module()
            m.conv = tnn.Conv2d(ci, C, 1)
            m.gn = tnn.GroupNorm(min(32, C), C)
            self.convs.append(m)
        extra = tnn.Module()
        extra.conv = tnn.Conv2d(in_channels[-1], C, 3, stride=2, padding=1)
        extra.gn = tnn.GroupNorm(min(32, C), C)
        self.extra_convs = tnn.ModuleList([extra])

    def forward(self, feats):
        outs = [m.gn(m.conv(f)) for m, f in zip(self.convs, feats)]
        outs.append(self.extra_convs[0].gn(self.extra_convs[0].conv(feats[-1])))
        return outs


def torch_msda_boxref(value, spatial_shapes, ref4, offsets, attn):
    """mmcv MSDA with 4-dim box references: loc = cxcy + off/P * wh * 0.5."""
    B, S, H, D = value.shape
    Q = ref4.shape[1]
    locs = ref4[:, :, None, None, None, :2] + offsets / PTS * ref4[
        :, :, None, None, None, 2:
    ] * 0.5
    splits = [h * w for h, w in spatial_shapes]
    values = value.split(splits, dim=1)
    out = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = values[lvl].flatten(2).transpose(1, 2).reshape(B * H, D, h, w)
        grid = 2 * locs[:, :, :, lvl] - 1
        grid = grid.transpose(1, 2).flatten(0, 1)
        out.append(
            F.grid_sample(v, grid, mode="bilinear", padding_mode="zeros",
                          align_corners=False)
        )
    out = torch.stack(out, dim=-2)
    aw = attn.transpose(1, 2).reshape(B * H, 1, Q, LVLS * PTS)
    res = (out.flatten(-2) * aw).sum(-1)
    return res.view(B, H * D, Q).transpose(1, 2)


class TorchDeformCross(tnn.Module):
    def __init__(self):
        super().__init__()
        self.sampling_offsets = tnn.Linear(C, HEADS * LVLS * PTS * 2)
        self.attention_weights = tnn.Linear(C, HEADS * LVLS * PTS)
        self.value_proj = tnn.Linear(C, C)
        self.output_proj = tnn.Linear(C, C)

    def forward(self, query, value, ref4, shapes, query_pos):
        B, Q, _ = query.shape
        identity = query
        q = query + query_pos
        v = self.value_proj(value).view(B, -1, HEADS, C // HEADS)
        off = self.sampling_offsets(q).view(B, Q, HEADS, LVLS, PTS, 2)
        aw = self.attention_weights(q).view(B, Q, HEADS, LVLS * PTS)
        aw = aw.softmax(-1).view(B, Q, HEADS, LVLS, PTS)
        out = torch_msda_boxref(
            v, shapes, ref4, off.permute(0, 1, 2, 3, 4, 5), aw
        )
        return identity + self.output_proj(out)


class TorchDecoderLayer(tnn.Module):
    """mmdet DeformableDetrTransformerDecoderLayer, mmcv naming:
    self_attn -> norm -> cross_attn -> norm -> ffn -> norm (post-norm)."""

    def __init__(self):
        super().__init__()
        a0 = tnn.Module()
        a0.attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.attentions = tnn.ModuleList([a0, TorchDeformCross()])
        self.norms = tnn.ModuleList([tnn.LayerNorm(C) for _ in range(3)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFN), tnn.ReLU()), tnn.Linear(FFN, C)
        )
        self.ffns = tnn.ModuleList([ffn])

    def forward(self, q, qpos, memory, ref4, shapes):
        x = q + self.attentions[0].attn(q + qpos, q + qpos, q)[0]
        x = self.norms[0](x)
        x = self.attentions[1](x, memory, ref4, shapes, qpos)
        x = self.norms[1](x)
        x = self.norms[2](x + self.ffns[0].layers(x))
        return x


class TorchRMSNorm(tnn.Module):
    def __init__(self):
        super().__init__()
        self.weight = tnn.Parameter(torch.rand(C) + 0.5)

    def forward(self, x):
        out = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-6)
        return out * self.weight


class TorchRelationLayer(tnn.Module):
    """Pre-norm: norm -> cross_attn -> norm -> self_attn -> norm -> ffn,
    no trailing norm; FFN = Linear(C, FFN) -> SwiGLU chunk -> Linear."""

    def __init__(self):
        super().__init__()
        a0 = tnn.Module()
        a0.attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        a1 = tnn.Module()
        a1.attn = tnn.MultiheadAttention(C, HEADS, batch_first=True)
        self.attentions = tnn.ModuleList([a0, a1])
        self.norms = tnn.ModuleList([TorchRMSNorm() for _ in range(3)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFN), tnn.Identity()),
            tnn.Linear(FFN // 2, C),
        )
        self.ffns = tnn.ModuleList([ffn])

    def forward(self, q, qpos, mem, key_pos):
        n1 = self.norms[0](q)
        x = q + self.attentions[0].attn(n1 + qpos, mem + key_pos, mem)[0]
        n2 = self.norms[1](x)
        x = x + self.attentions[1].attn(n2 + qpos, n2 + qpos, n2)[0]
        n3 = self.norms[2](x)
        y = self.ffns[0].layers[0][0](n3)
        a, gate = y.chunk(2, dim=-1)
        return x + self.ffns[0].layers[1](F.silu(gate) * a)


def test_channel_mapper_parity():
    tm = TorchChannelMapper([6, 8, 10])
    tm.eval()
    sd = {f"neck.{k}": v for k, v in tm.state_dict().items()}
    flat = convert_crosshead_bbox(sd, prefix="bbox_head.")
    params = unflatten(flat)["neck"]
    rng = np.random.default_rng(0)
    feats = [
        rng.normal(size=(2, ci, 16 // (2**i), 16 // (2**i))).astype(np.float32)
        for i, ci in enumerate([6, 8, 10])
    ]
    with torch.no_grad():
        t_outs = tm([torch.tensor(f) for f in feats])
    jm = ChannelMapper(C, 4)
    j_outs = jm.apply(
        {"params": params}, [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats]
    )
    for j, t in zip(j_outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(j).transpose(0, 3, 1, 2), t.numpy(), atol=2e-4
        )


def test_decoder_layer_parity():
    tm = TorchDecoderLayer()
    tm.eval()
    sd = {
        f"bbox_head.transformer.decoder.layers.0.{k}": v
        for k, v in tm.state_dict().items()
    }
    flat = convert_crosshead_bbox(sd, prefix="bbox_head.")
    params = unflatten(flat)["dec_0"]

    shapes = [(8, 8), (4, 4), (2, 2), (1, 1)]
    S = sum(h * w for h, w in shapes)
    rng = np.random.default_rng(1)
    q = rng.normal(size=(2, 6, C)).astype(np.float32)
    qpos = rng.normal(size=(2, 6, C)).astype(np.float32)
    mem = rng.normal(size=(2, S, C)).astype(np.float32)
    ref4 = rng.uniform(0.2, 0.8, size=(2, 6, 4)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(
            torch.tensor(q), torch.tensor(qpos), torch.tensor(mem),
            torch.tensor(ref4), shapes,
        )
    jm = DeformableDecoderLayer(C, HEADS, LVLS, PTS, FFN)
    ref4_l = jnp.broadcast_to(jnp.asarray(ref4)[:, :, None, :], (2, 6, LVLS, 4))
    j_out = jm.apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(qpos),
        jnp.asarray(mem), ref4_l, shapes,
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)


def test_relation_layer_parity():
    tm = TorchRelationLayer()
    tm.eval()
    sd = {
        f"bbox_head.relation_decoder.layers.0.{k}": v
        for k, v in tm.state_dict().items()
    }
    # RMSNorm state keys: norms.{i}.weight (no bias) — present above
    flat = convert_crosshead_bbox(sd, prefix="bbox_head.")
    params = unflatten(flat)["relation_layer_0"]
    rng = np.random.default_rng(2)
    q = rng.normal(size=(2, 5, C)).astype(np.float32)
    qpos = rng.normal(size=(1, 5, C)).astype(np.float32)
    mem = rng.normal(size=(2, 10, C)).astype(np.float32)
    kpos = rng.normal(size=(1, 10, C)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(
            torch.tensor(q), torch.tensor(np.broadcast_to(qpos, (2, 5, C)).copy()),
            torch.tensor(mem), torch.tensor(np.broadcast_to(kpos, (2, 10, C)).copy()),
        )
    jm = RelationFusionLayerRMS(C, HEADS, FFN)
    j_out = jm.apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(qpos),
        jnp.asarray(mem), jnp.asarray(kpos),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)


def test_full_tree_merges_into_tiny_head():
    """Name/shape completeness: a full reference-named state dict converts
    and overlays onto CrossHeadBBox.init without unexpected keys."""
    from pairnet_tpu.utils.torch_convert import merge_pretrained

    NC, NR, Q, K = 6, 5, 10, 8
    ENC, DEC, REL = 2, 2, 2

    sd = {}
    tm_neck = TorchChannelMapper([6, 8, 10])
    sd.update({f"neck.{k}": v for k, v in tm_neck.state_dict().items()})
    sd["bbox_head.transformer.level_embeds"] = torch.randn(LVLS, C)
    for i in range(ENC):
        enc = tnn.Module()
        enc.attentions = tnn.ModuleList([TorchDeformCross()])
        enc.norms = tnn.ModuleList([tnn.LayerNorm(C), tnn.LayerNorm(C)])
        ffn = tnn.Module()
        ffn.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(C, FFN), tnn.ReLU()), tnn.Linear(FFN, C)
        )
        enc.ffns = tnn.ModuleList([ffn])
        sd.update({
            f"bbox_head.transformer.encoder.layers.{i}.{k}": v
            for k, v in enc.state_dict().items()
        })
    for i in range(DEC):
        sd.update({
            f"bbox_head.transformer.decoder.layers.{i}.{k}": v
            for k, v in TorchDecoderLayer().state_dict().items()
        })
    sd["bbox_head.transformer.enc_output.weight"] = torch.randn(C, C)
    sd["bbox_head.transformer.enc_output.bias"] = torch.randn(C)
    sd["bbox_head.transformer.enc_output_norm.weight"] = torch.randn(C)
    sd["bbox_head.transformer.enc_output_norm.bias"] = torch.randn(C)
    sd["bbox_head.transformer.pos_trans_fc.weight"] = torch.randn(2 * C, 512)
    sd["bbox_head.transformer.pos_trans_fc.bias"] = torch.randn(2 * C)
    sd["bbox_head.transformer.pos_trans_norm.weight"] = torch.randn(2 * C)
    sd["bbox_head.transformer.pos_trans_norm.bias"] = torch.randn(2 * C)
    for i in range(DEC + 1):  # + encoder-proposal head
        sd[f"bbox_head.cls_branches.{i}.weight"] = torch.randn(NC, C)
        sd[f"bbox_head.cls_branches.{i}.bias"] = torch.randn(NC)
        for li, (a, b) in zip((0, 2, 4), ((C, C), (C, C), (4, C))):
            sd[f"bbox_head.reg_branches.{i}.{li}.weight"] = torch.randn(a, b)
            sd[f"bbox_head.reg_branches.{i}.{li}.bias"] = torch.randn(a)
    for name in ("sub_query_update", "obj_query_update"):
        for li in (0, 2, 4):
            sd[f"bbox_head.{name}.{li}.weight"] = torch.randn(C, C)
            sd[f"bbox_head.{name}.{li}.bias"] = torch.randn(C)
    sd["bbox_head.rel_cls_embed.weight"] = torch.randn(NR, C)
    sd["bbox_head.rel_cls_embed.bias"] = torch.randn(NR)
    sd["bbox_head.rel_query_feat.weight"] = torch.randn(K, C)
    sd["bbox_head.rel_query_pos_embed.weight"] = torch.randn(K, C)
    sd["bbox_head.rel_key_pos_embed.weight"] = torch.randn(2 * K, C)
    sd["bbox_head.rel_value_pos_embed.weight"] = torch.randn(2 * K, C)
    for i, (cin, cout, k) in enumerate(
        [(1, 64, 7), (64, 64, 7), (64, 1, 7)]  # ConvTiny (cnn_factory.py:6-40)
    ):
        sd[f"bbox_head.update_importance.conv_layers.{i}.0.weight"] = torch.randn(
            cout, cin, k, k
        )
        sd[f"bbox_head.update_importance.conv_layers.{i}.0.bias"] = torch.randn(cout)
    for i in range(REL):
        sd.update({
            f"bbox_head.relation_decoder.layers.{i}.{k}": v
            for k, v in TorchRelationLayer().state_dict().items()
        })

    flat = convert_crosshead_bbox(sd, prefix="bbox_head.")
    head = CrossHeadBBox(
        num_classes=NC, num_relations=NR, num_obj_query=Q, num_rel_query=K,
        embed_dims=C, num_heads=HEADS, num_encoder_layers=ENC,
        num_decoder_layers=DEC, num_relation_layers=REL,
        ffn_channels=FFN, relation_ffn_channels=FFN,
    )
    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.normal(size=(1, 32 // (2**i), 32 // (2**i), ci)),
                    jnp.float32)
        for i, ci in enumerate([4, 6, 8, 10])
    ]
    variables = head.init(jax.random.PRNGKey(0), feats)
    merged = merge_pretrained(
        variables["params"], unflatten(flat)
    )  # raises on unexpected keys / shape mismatch
    out = head.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, merged)}, feats
    )
    assert out["rel"].shape == (1, K, NR)
    assert np.isfinite(np.asarray(out["rel"])).all()
