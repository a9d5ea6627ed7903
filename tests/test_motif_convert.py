"""MOTIFS head weight-conversion numerics vs a pure-torch reference mirror.

VERDICT r2 #2: the reference two-stage MOTIFS head has published weights
(warm-started over a frozen PanopticFPN); this file mirrors the reference's
LSTMContext in plain torch with reference state-dict naming — obj_embed1/2,
pos_embed Sequential (Linear-BN1d-Linear-ReLU), bidirectional torch LSTMs
for obj/edge context, the custom highway-LSTM DecoderRNN
(ref: approaches/motif.py:90-170 lstm_equations), lin_obj_h/lin_edge_h,
post_emb/post_cat/rel_compress/up_dim and FrequencyBias
(ref: motif_head.py:20-54) — and asserts the converted flax MotifHead
matches to <= 2e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.heads.twostage.contexts import LSTMContext  # noqa: E402
from pairnet_tpu.models.heads.twostage.core import (  # noqa: E402
    FrequencyBias,
    encode_box_info,
)
from pairnet_tpu.utils.torch_convert import convert_motif_head  # noqa: E402

torch.manual_seed(0)

C = 11        # object classes incl bg
PRED = 7      # predicates incl bg
EMB = 8
HID = 16
ROI = 24
POOL = 32
N = 5         # objects (single image, boxes pre-sorted by descending cx)


class TorchDecoderRNN(tnn.Module):
    """Reference DecoderRNN highway LSTM (motif.py:70-258), eval mode."""

    def __init__(self, inputs_dim):
        super().__init__()
        self.obj_embed = tnn.Embedding(C + 1, EMB)
        self.input_linearity = tnn.Linear(inputs_dim + EMB, 6 * HID)
        self.state_linearity = tnn.Linear(HID, 5 * HID)
        self.out_obj = tnn.Linear(HID, C)

    def forward(self, seq, labels=None):
        # seq (N, D) in sorted order; labels (N,) teacher forcing or None
        h = torch.zeros(1, HID)
        c = torch.zeros(1, HID)
        prev_embed = self.obj_embed.weight[0, None]
        dists, preds = [], []
        for t in range(seq.shape[0]):
            inp = torch.cat([seq[t : t + 1], prev_embed], dim=1)
            pi = self.input_linearity(inp)
            ps = self.state_linearity(h)
            gate = lambda k: pi[:, k * HID : (k + 1) * HID] + ps[
                :, k * HID : (k + 1) * HID
            ]
            i = torch.sigmoid(gate(0))
            f = torch.sigmoid(gate(1))
            g = torch.tanh(gate(2))
            o = torch.sigmoid(gate(3))
            c = i * g + f * c
            h = o * torch.tanh(c)
            hw = torch.sigmoid(gate(4))
            h = hw * h + (1 - hw) * pi[:, 5 * HID : 6 * HID]
            dist = self.out_obj(h)
            pred = dist[:, 1:].argmax(-1) + 1
            nxt = labels[t : t + 1] if labels is not None else pred
            prev_embed = self.obj_embed(nxt.long() + 1)  # ref: label + 1
            dists.append(dist)
            preds.append(nxt)
        return torch.cat(dists), torch.cat(preds)


class TorchLSTMContext(tnn.Module):
    def __init__(self, mode):
        super().__init__()
        self.mode = mode
        self.obj_embed1 = tnn.Embedding(C, EMB)
        self.obj_embed2 = tnn.Embedding(C, EMB)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(9, 32), tnn.BatchNorm1d(32, momentum=0.001),
            tnn.Linear(32, 128), tnn.ReLU(inplace=True),
        )
        in_dim = ROI + EMB + 128
        self.obj_ctx_rnn = tnn.LSTM(in_dim, HID, 1, bidirectional=True)
        self.decoder_rnn = TorchDecoderRNN(HID + in_dim)
        self.edge_ctx_rnn = tnn.LSTM(EMB + HID + ROI, HID, 1, bidirectional=True)
        self.lin_obj_h = tnn.Linear(2 * HID, HID)
        self.lin_edge_h = tnn.Linear(2 * HID, HID)

    def forward(self, roi, boxes, hw, labels=None, dists=None):
        # single image, boxes already in descending-cx order (perm = id)
        if self.mode == "predcls":
            emb = self.obj_embed1(labels.long())
        else:
            emb = dists.detach() @ self.obj_embed1.weight
        wid, hei = hw[1], hw[0]
        w = boxes[:, 2] - boxes[:, 0] + 1
        h = boxes[:, 3] - boxes[:, 1] + 1
        x = boxes[:, 0] + 0.5 * w
        y = boxes[:, 1] + 0.5 * h
        info = torch.stack(
            [w / wid, h / hei, x / wid, y / hei, boxes[:, 0] / wid,
             boxes[:, 1] / hei, boxes[:, 2] / wid, boxes[:, 3] / hei,
             w * h / (wid * hei)], -1,
        )
        pos = self.pos_embed(info)
        obj_pre = torch.cat([roi, emb, pos], -1)
        enc, _ = self.obj_ctx_rnn(obj_pre[:, None])  # (N, 1, 2H)
        enc = self.lin_obj_h(enc[:, 0])
        if self.mode == "predcls":
            obj_preds = labels
            obj_dists = F.one_hot(labels.long(), C).float()
        else:
            dec_in = torch.cat([obj_pre, enc], -1)
            obj_dists, obj_preds = self.decoder_rnn(
                dec_in, labels if labels is not None else None
            )
        emb2 = self.obj_embed2(obj_preds.long())
        edge_in = torch.cat([emb2, roi, enc], -1)
        edge, _ = self.edge_ctx_rnn(edge_in[:, None])
        return obj_dists, obj_preds, self.lin_edge_h(edge[:, 0])


class TorchMotifPost(tnn.Module):
    def __init__(self):
        super().__init__()
        self.post_emb = tnn.Linear(HID, HID * 2)
        self.post_cat = tnn.Linear(HID * 2, POOL)
        self.rel_compress = tnn.Linear(POOL, PRED)
        self.up_dim = tnn.Linear(ROI, POOL)
        fb = tnn.Module()
        fb.obj_baseline = tnn.Embedding((C - 1) * (C - 1), PRED)
        self.freq_bias = fb

    def forward(self, edge_ctx, union, pairs, obj_preds):
        edge_rep = self.post_emb(edge_ctx).view(-1, 2, HID)
        head, tail = edge_rep[:, 0], edge_rep[:, 1]
        prod = torch.cat([head[pairs[:, 0]], tail[pairs[:, 1]]], -1)
        prod = self.post_cat(prod) * self.up_dim(union)
        rel = self.rel_compress(prod)
        pp = torch.stack([obj_preds[pairs[:, 0]], obj_preds[pairs[:, 1]]], -1)
        idx = (pp[:, 0] - 1) * (C - 1) + (pp[:, 1] - 1)
        return rel + self.freq_bias.obj_baseline(idx.long())


def _state_dict(ctx, post):
    sd = {}
    for k, v in ctx.state_dict().items():
        sd[f"relation_head.context_layer.{k}"] = v
    for k, v in post.state_dict().items():
        sd[f"relation_head.{k}"] = v
    return sd


def _make_inputs(seed):
    rng = np.random.default_rng(seed)
    roi = rng.normal(size=(N, ROI)).astype(np.float32)
    # descending center-x so the sort permutation is identity on both sides
    x1 = np.linspace(60, 10, N).astype(np.float32)
    boxes = np.stack([x1, x1 * 0.5, x1 + 12, x1 * 0.5 + 9], -1)
    labels = rng.integers(1, C, size=(N,)).astype(np.int32)
    dists = rng.normal(size=(N, C)).astype(np.float32)
    dists = np.exp(dists) / np.exp(dists).sum(-1, keepdims=True)
    union_pairs = np.asarray([[0, 1], [1, 2], [3, 4], [2, 0]], np.int32)
    union = rng.normal(size=(len(union_pairs), ROI)).astype(np.float32)
    hw = np.asarray([80.0, 100.0], np.float32)
    return roi, boxes, labels, dists, union_pairs, union, hw


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_lstm_context_parity(mode):
    ctx = TorchLSTMContext(mode)
    ctx.eval()
    post = TorchMotifPost()
    sd = _state_dict(ctx, post)
    conv = convert_motif_head(sd)

    roi, boxes, labels, dists, pairs, union, hw = _make_inputs(3)
    with torch.no_grad():
        t_dists, t_preds, t_edge = ctx(
            torch.tensor(roi), torch.tensor(boxes), torch.tensor(hw),
            labels=torch.tensor(labels),
            dists=torch.tensor(dists),
        )
        t_rel = post(
            t_edge, torch.tensor(union), torch.tensor(pairs.astype(np.int64)),
            t_preds,
        )

    jm = LSTMContext(C, mode=mode, embed_dim=EMB, hidden_dim=HID, roi_dim=ROI)
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        {
            "params": conv["params"]["context_layer"],
            "batch_stats": conv["batch_stats"]["context_layer"],
        },
    )
    j_dists, j_preds, j_edge = jm.apply(
        variables,
        jnp.asarray(roi)[None], jnp.asarray(boxes)[None],
        jnp.ones((1, N), bool), jnp.asarray(hw)[None],
        labels=jnp.asarray(labels)[None],
        dists=jnp.asarray(dists)[None],
    )
    np.testing.assert_array_equal(np.asarray(j_preds[0]), t_preds.numpy())
    np.testing.assert_allclose(
        np.asarray(j_dists[0]), t_dists.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(j_edge[0]), t_edge.numpy(), atol=2e-4
    )

    # post-decode chain on the converted params
    p = conv["params"]
    edge = np.asarray(j_edge[0])
    er = edge @ np.asarray(p["post_emb"]["kernel"]) + np.asarray(
        p["post_emb"]["bias"]
    )
    er = er.reshape(N, 2, HID)
    prod = np.concatenate(
        [er[pairs[:, 0], 0], er[pairs[:, 1], 1]], -1
    )
    prod = prod @ np.asarray(p["post_cat"]["kernel"]) + np.asarray(
        p["post_cat"]["bias"]
    )
    up = union @ np.asarray(p["up_dim"]["kernel"]) + np.asarray(
        p["up_dim"]["bias"]
    )
    rel = (prod * up) @ np.asarray(p["rel_compress"]["kernel"]) + np.asarray(
        p["rel_compress"]["bias"]
    )
    preds = np.asarray(j_preds[0])
    idx = (preds[pairs[:, 0]] - 1) * (C - 1) + (preds[pairs[:, 1]] - 1)
    rel = rel + np.asarray(p["freq_bias"]["pred_baseline"])[idx]
    np.testing.assert_allclose(rel, t_rel.numpy(), atol=2e-4)


def test_freq_bias_indexing_matches_reference():
    """FrequencyBias.index_with_labels uses (sub-1)*C + (obj-1) on 1-based
    labels (ref: motif.py:42-50)."""
    table = np.arange(9 * PRED, dtype=np.float32).reshape(9, PRED)
    fb = FrequencyBias(3, PRED)
    out = fb.apply(
        {"params": {"pred_baseline": jnp.asarray(table)}},
        jnp.asarray([[1, 1], [3, 2], [2, 3]]),
    )
    np.testing.assert_array_equal(
        np.asarray(out), table[[0 * 3 + 0, 2 * 3 + 1, 1 * 3 + 2]]
    )
