"""Full CrossHead2 (Pair-Net head) conversion numerics vs a torch mirror.

VERDICT r1 #4 (second half): beyond the pixel decoder, the masked-attention
decoder loop (per-layer forward_head + attn masks), PPN (MLPs -> normalize
-> outer product -> ConvTiny -> top-k) and Relation Fusion decoder get an
end-to-end numeric parity check at tiny dims through convert_pairnet_head.
The mirror reimplements the reference CrossHead2 forward semantics
(ref: pairnet/models/relation_heads/pairnet_head.py:216-417) with mmcv/mmdet
state-dict naming.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from test_pixel_decoder_parity import (  # noqa: E402
    C, HEADS, LVLS, _TorchPixelDecoder, sine_pos,
)
from pairnet_tpu.models.heads.pairnet_head import PairNetHead  # noqa: E402
from pairnet_tpu.utils.torch_convert import convert_pairnet_head, unflatten  # noqa: E402

torch.manual_seed(1)

NQ = 10  # object queries
NK = 6  # relation queries
NCLS = 7
NREL = 5
DEC_LAYERS = 3
REL_LAYERS = 2
FF_DEC = 64


class _FFN(tnn.Module):
    def __init__(self, c, ff):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.Sequential(tnn.Linear(c, ff), tnn.ReLU()), tnn.Linear(ff, c)
        )

    def forward(self, x):
        return self.layers(x)


class _DecLayer(tnn.Module):
    """mmcv DetrTransformerDecoderLayer (cross->norm->self->norm->ffn->norm);
    sd names attentions.0.attn / attentions.1.attn / norms.{0,1,2} / ffns.0."""

    def __init__(self, c, ff):
        super().__init__()
        self.attentions = tnn.ModuleList([tnn.Module(), tnn.Module()])
        self.attentions[0].attn = tnn.MultiheadAttention(c, HEADS, batch_first=True)
        self.attentions[1].attn = tnn.MultiheadAttention(c, HEADS, batch_first=True)
        self.norms = tnn.ModuleList([tnn.LayerNorm(c) for _ in range(3)])
        self.ffns = tnn.ModuleList([_FFN(c, ff)])

    def forward(self, q, qpos, mem, mpos, attn_mask=None):
        x = q + self.attentions[0].attn(
            q + qpos, mem + mpos if mpos is not None else mem, mem,
            attn_mask=attn_mask,
        )[0]
        x = self.norms[0](x)
        x = x + self.attentions[1].attn(x + qpos, x + qpos, x)[0]
        x = self.norms[1](x)
        x = x + self.ffns[0](x)
        return self.norms[2](x)


class _MLP3(tnn.Module):
    """Sequential(Linear, ReLU, Linear, ReLU, Linear) — sd indices 0/2/4."""

    def __init__(self, c):
        super().__init__()
        self.seq = tnn.Sequential(
            tnn.Linear(c, c), tnn.ReLU(), tnn.Linear(c, c), tnn.ReLU(),
            tnn.Linear(c, c),
        )

    def forward(self, x):
        return self.seq(x)


class _ConvTiny(tnn.Module):
    """conv_layers.{i}.0 = Conv2d 7x7 pad 3 (ref: cnn_factory.py ConvTiny)."""

    def __init__(self):
        super().__init__()
        self.conv_layers = tnn.ModuleList(
            [tnn.Sequential(tnn.Conv2d(1, 64, 7, padding=3), tnn.ReLU()),
             tnn.Sequential(tnn.Conv2d(64, 64, 7, padding=3), tnn.ReLU()),
             tnn.Sequential(tnn.Conv2d(64, 1, 7, padding=3), tnn.Identity())]
        )

    def forward(self, x):  # (B, Q, Q)
        x = x[:, None]
        x = F.relu(self.conv_layers[0][0](x))
        x = F.relu(self.conv_layers[1][0](x))
        return self.conv_layers[2][0](x)[:, 0]


class _TorchCrossHead2(tnn.Module):
    """Reference CrossHead2 forward mirror (mmdet/mmcv naming)."""

    def __init__(self, in_channels):
        super().__init__()
        self.pixel_decoder = _TorchPixelDecoder(in_channels)
        self.transformer_decoder = tnn.Module()
        self.transformer_decoder.layers = tnn.ModuleList(
            [_DecLayer(C, FF_DEC) for _ in range(DEC_LAYERS)]
        )
        self.transformer_decoder.post_norm = tnn.LayerNorm(C)
        self.query_feat = tnn.Embedding(NQ, C)
        self.query_embed = tnn.Embedding(NQ, C)
        self.level_embed = tnn.Embedding(LVLS, C)
        self.cls_embed = tnn.Linear(C, NCLS + 1)
        self.mask_embed = tnn.Sequential(
            tnn.Linear(C, C), tnn.ReLU(), tnn.Linear(C, C), tnn.ReLU(),
            tnn.Linear(C, C),
        )
        self.sub_query_update = _MLP3(C).seq
        self.obj_query_update = _MLP3(C).seq
        self.rel_query_feat = tnn.Embedding(NK, C)
        self.rel_query_embed = tnn.Embedding(NK, C)
        self.rel_query_embed2 = tnn.Embedding(2 * NK, C)
        self.rel_query_embed3 = tnn.Embedding(2 * NK, C)
        self.rel_cls_embed = tnn.Linear(C, NREL)
        self.update_importance = _ConvTiny()
        self.relation_decoder = tnn.Module()
        self.relation_decoder.layers = tnn.ModuleList(
            [_DecLayer(C, FF_DEC) for _ in range(REL_LAYERS)]
        )

    def forward_head(self, query, mask_features, attn_hw):
        out = self.transformer_decoder.post_norm(query)
        cls_pred = self.cls_embed(out)
        emb = self.mask_embed(out)
        mask_pred = torch.einsum("bqc,bchw->bqhw", emb, mask_features)
        am = F.interpolate(
            mask_pred, size=attn_hw, mode="bilinear", align_corners=False
        )
        am = (am.flatten(2).sigmoid() < 0.5).detach()  # (B, Q, S)
        return cls_pred, mask_pred, am

    def forward(self, feats):
        B = feats[0].shape[0]
        mask_features, ms = self.pixel_decoder(feats)
        shapes = [(m.shape[-2], m.shape[-1]) for m in ms]
        mems, mposs = [], []
        for lvl, m in enumerate(ms):
            mems.append(
                m.flatten(2).transpose(1, 2)
                + self.level_embed.weight[lvl]  # Mask2Former: embed on TOKENS
            )
            mposs.append(
                sine_pos(*shapes[lvl]).flatten(1).transpose(0, 1)[None]
            )
        query = self.query_feat.weight[None].expand(B, -1, -1)
        qpos = self.query_embed.weight[None]
        cls_pred, mask_pred, am = self.forward_head(
            query, mask_features, shapes[0]
        )
        for i, layer in enumerate(self.transformer_decoder.layers):
            lvl = i % LVLS
            full = am.all(-1, keepdim=True)
            am = am & ~full
            amh = am[:, None].expand(-1, HEADS, -1, -1).flatten(0, 1)
            query = layer(query, qpos, mems[lvl], mposs[lvl], attn_mask=amh)
            cls_pred, mask_pred, am = self.forward_head(
                query, mask_features, shapes[(i + 1) % LVLS]
            )

        sub = F.normalize(self.sub_query_update(query), dim=-1)
        obj = F.normalize(self.obj_query_update(query), dim=-1)
        importance = torch.einsum("bqc,bkc->bqk", sub, obj)
        importance = self.update_importance(importance)
        _, topk = importance.flatten(1).topk(NK, dim=-1)
        sub_pos = topk // NQ
        obj_pos = topk % NQ
        gather = lambda t, i: torch.stack([t[b, i[b]] for b in range(B)])
        pair = torch.cat([gather(query, sub_pos), gather(query, obj_pos)], 1)

        rel_q = self.rel_query_feat.weight[None].expand(B, -1, -1)
        for layer in self.relation_decoder.layers:
            rel_q = layer(
                rel_q, self.rel_query_embed.weight[None], pair,
                self.rel_query_embed2.weight[None],
            )
        rel = self.rel_cls_embed(rel_q)
        return {
            "cls": cls_pred,
            "mask": mask_pred,
            "rel": rel,
            "importance": importance,
            "sub_pos": sub_pos,
            "obj_pos": obj_pos,
        }


def test_full_pairnet_head_conversion_numeric():
    in_channels = [8, 12, 16, 24]
    tm = _TorchCrossHead2(in_channels)
    tm.eval()
    flat = convert_pairnet_head(tm.state_dict(), prefix="")
    params = unflatten(flat)

    jm = PairNetHead(
        num_classes=NCLS, num_relations=NREL, num_obj_query=NQ,
        num_rel_query=NK, embed_dims=C, num_heads=HEADS,
        num_decoder_layers=DEC_LAYERS, num_relation_layers=REL_LAYERS,
        pixel_decoder_layers=2, pixel_decoder_ffn=64, decoder_ffn=FF_DEC,
        relation_ffn=FF_DEC,
    )
    rng = np.random.default_rng(0)
    feats_np = [
        rng.normal(size=(2, ci, 32 // (2 ** i), 48 // (2 ** i))).astype(
            np.float32
        )
        for i, ci in enumerate(in_channels)
    ]
    with torch.no_grad():
        ref = tm([torch.tensor(f) for f in feats_np])

    j_feats = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_np]
    out = jm.apply({"params": params}, j_feats)

    np.testing.assert_allclose(
        np.asarray(out["cls"]), ref["cls"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["mask"]), ref["mask"].numpy(), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["importance"]), ref["importance"].numpy(), atol=2e-4
    )
    np.testing.assert_array_equal(
        np.asarray(out["sub_pos"]), ref["sub_pos"].numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(out["obj_pos"]), ref["obj_pos"].numpy()
    )
    np.testing.assert_allclose(
        np.asarray(out["rel"]), ref["rel"].numpy(), atol=2e-4
    )
