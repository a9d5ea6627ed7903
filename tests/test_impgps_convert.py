"""IMP / GPS-Net head conversion numerics vs pure-torch reference mirrors.

Completes VERDICT r2 #2 across the two-stage family: torch mirrors of the
reference IMPContext GRU message passing (ref: approaches/imp.py:17-170)
and GPS-Net's DirectionAwareMessagePassing + relation_infer
(ref: approaches/dmp.py:23-170, gps_head.py:20-65) with reference
state-dict naming; the converted flax modules must match to <= 2e-4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.heads.twostage.contexts import (  # noqa: E402
    DMPContext,
    IMPContext,
)
from pairnet_tpu.utils.torch_convert import (  # noqa: E402
    convert_gps_head,
    convert_imp_head,
)

torch.manual_seed(0)
C = 9       # object classes incl bg
PRED = 6    # predicates incl bg
HID = 16
ROI = 24
EMB = 8
N, P = 5, 6


class TorchIMP(tnn.Module):
    def __init__(self, num_iter=2):
        super().__init__()
        self.num_iter = num_iter
        self.rel_fc = tnn.Linear(HID, PRED)
        self.obj_fc = tnn.Linear(HID, C)
        self.obj_unary = tnn.Linear(ROI, HID)
        self.edge_unary = tnn.Linear(ROI, HID)
        self.edge_gru = tnn.GRUCell(HID, HID)
        self.node_gru = tnn.GRUCell(HID, HID)
        self.sub_vert_w_fc = tnn.Sequential(tnn.Linear(HID * 2, 1), tnn.Sigmoid())
        self.obj_vert_w_fc = tnn.Sequential(tnn.Linear(HID * 2, 1), tnn.Sigmoid())
        self.out_edge_w_fc = tnn.Sequential(tnn.Linear(HID * 2, 1), tnn.Sigmoid())
        self.in_edge_w_fc = tnn.Sequential(tnn.Linear(HID * 2, 1), tnn.Sigmoid())

    def forward(self, x, union, pairs):
        obj_rep = self.obj_unary(x)
        rel_rep = F.relu(self.edge_unary(union))
        sub_idx = pairs[:, 0]
        obj_idx = pairs[:, 1]
        sub2rel = torch.zeros(N, P)
        obj2rel = torch.zeros(N, P)
        sub2rel[sub_idx, torch.arange(P)] = 1.0
        obj2rel[obj_idx, torch.arange(P)] = 1.0
        vert = [self.node_gru(obj_rep, torch.zeros(N, HID))]
        edge = [self.edge_gru(rel_rep, torch.zeros(P, HID))]
        for i in range(self.num_iter):
            sub_vert = vert[i][sub_idx]
            obj_vert = vert[i][obj_idx]
            ws = self.sub_vert_w_fc(torch.cat((sub_vert, edge[i]), 1)) * sub_vert
            wo = self.obj_vert_w_fc(torch.cat((obj_vert, edge[i]), 1)) * obj_vert
            edge.append(self.edge_gru(ws + wo, edge[i]))
            pre_out = self.out_edge_w_fc(torch.cat((sub_vert, edge[i]), 1)) * edge[i]
            pre_in = self.in_edge_w_fc(torch.cat((obj_vert, edge[i]), 1)) * edge[i]
            vert.append(self.node_gru(sub2rel @ pre_out + obj2rel @ pre_in, vert[i]))
        return self.obj_fc(vert[-1]), self.rel_fc(edge[-1])


def test_imp_context_parity():
    tm = TorchIMP()
    tm.eval()
    sd = {f"relation_head.context_layer.{k}": v for k, v in tm.state_dict().items()}
    conv = convert_imp_head(sd)

    rng = np.random.default_rng(0)
    roi = rng.normal(size=(N, ROI)).astype(np.float32)
    union = rng.normal(size=(P, ROI)).astype(np.float32)
    pairs = np.asarray([[0, 1], [1, 2], [3, 4], [2, 0], [4, 1], [1, 3]], np.int64)
    with torch.no_grad():
        t_obj, t_rel = tm(
            torch.tensor(roi), torch.tensor(union), torch.tensor(pairs)
        )

    jm = IMPContext(C, PRED, hidden_dim=HID, mode="sgcls")
    variables = jax.tree_util.tree_map(
        jnp.asarray, {"params": conv["params"]["context_layer"]}
    )
    j_obj, j_rel = jm.apply(
        variables,
        jnp.asarray(roi)[None], jnp.asarray(union)[None],
        jnp.asarray(pairs.astype(np.int32))[None],
        jnp.ones((1, N), bool), jnp.ones((1, P), bool),
    )
    np.testing.assert_allclose(np.asarray(j_obj[0]), t_obj.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_rel[0]), t_rel.numpy(), atol=2e-4)


class TorchDMP(tnn.Module):
    def __init__(self):
        super().__init__()
        self.obj_embed = tnn.Embedding(C, EMB)
        self.pos_embed = tnn.Sequential(
            tnn.Linear(9, 32), tnn.BatchNorm1d(32, momentum=0.001),
            tnn.Linear(32, 128), tnn.ReLU(inplace=True),
        )
        self.ws = tnn.Linear(ROI, ROI)
        self.wo = tnn.Linear(ROI, ROI)
        self.wu = tnn.Linear(ROI, ROI)
        self.w = tnn.Linear(ROI, 1)
        self.project_input = tnn.Sequential(
            tnn.Linear(ROI + EMB + 128, ROI), tnn.ReLU(inplace=True)
        )
        self.trans = tnn.Sequential(
            tnn.Linear(ROI, ROI // 4), tnn.LayerNorm(ROI // 4),
            tnn.ReLU(inplace=True), tnn.Linear(ROI // 4, ROI),
        )
        self.W_t3 = tnn.Sequential(tnn.Linear(ROI, ROI // 2), tnn.ReLU(inplace=True))
        self.out_obj = tnn.Linear(ROI, C)

    def forward(self, roi, union, pairs, boxes, hw, labels):
        emb = self.obj_embed(labels.long())
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
        obj_rep = self.project_input(torch.cat([roi, emb, pos], -1))
        coeff = self.w(
            self.ws(obj_rep[pairs[:, 0]])
            * self.wo(obj_rep[pairs[:, 1]])
            * self.wu(union)
        )
        a = torch.zeros(N, N, 1)
        a[pairs[:, 0], pairs[:, 1]] += coeff
        a = torch.sigmoid(a) * (1 - torch.eye(N).unsqueeze(-1))
        a = a / a.sum(dim=1, keepdim=True)
        a2 = torch.cat([a, a.transpose(1, 0)], -1)  # (N, N, 2)
        t3 = self.W_t3(obj_rep)
        ctx = torch.cat([a2[:, :, 0] @ t3, a2[:, :, 1] @ t3], -1)
        out = F.relu(obj_rep + self.trans(ctx))
        return self.out_obj(out), out


class TorchGPSPost(tnn.Module):
    def __init__(self):
        super().__init__()
        self.w_proj1 = tnn.Linear(ROI, ROI)
        self.w_proj2 = tnn.Linear(ROI, ROI)
        self.w_proj3 = tnn.Linear(ROI, ROI)
        self.out_rel = tnn.Linear(ROI, PRED)
        self.wp = tnn.Linear(ROI, PRED)
        fb = tnn.Module()
        fb.obj_baseline = tnn.Embedding((C - 1) * (C - 1), PRED)
        self.freq_bias = fb

    def forward(self, ctx, union, pairs, obj_preds):
        pair_rep = torch.cat([ctx[pairs[:, 0]], ctx[pairs[:, 1]]], -1)
        t1 = self.w_proj1(pair_rep[:, :ROI])
        t2 = self.w_proj2(pair_rep[:, ROI:])
        t3 = self.w_proj3(union)
        t4 = F.relu(t1 + t2) - (t1 - t2) * (t1 - t2)
        rel = self.out_rel(F.relu(t4 + t3) - (t4 - t3) * (t4 - t3))
        pp = torch.stack([obj_preds[pairs[:, 0]], obj_preds[pairs[:, 1]]], -1)
        idx = (pp[:, 0] - 1) * (C - 1) + (pp[:, 1] - 1)
        log_freq = F.log_softmax(self.freq_bias.obj_baseline(idx.long()), dim=-1)
        return rel + torch.sigmoid(self.wp(union)) * log_freq


def test_dmp_context_and_relation_infer_parity():
    ctx_m = TorchDMP()
    ctx_m.eval()
    post = TorchGPSPost()
    sd = {}
    for k, v in ctx_m.state_dict().items():
        sd[f"relation_head.context_layer.{k}"] = v
    for k, v in post.state_dict().items():
        sd[f"relation_head.{k}"] = v
    conv = convert_gps_head(sd)

    rng = np.random.default_rng(1)
    roi = rng.normal(size=(N, ROI)).astype(np.float32)
    union = rng.normal(size=(P, ROI)).astype(np.float32)
    pairs = np.asarray([[0, 1], [1, 2], [3, 4], [2, 0], [4, 1], [1, 3]], np.int64)
    x1 = np.linspace(5, 60, N).astype(np.float32)
    boxes = np.stack([x1, x1 * 0.4, x1 + 11, x1 * 0.4 + 7], -1)
    labels = rng.integers(1, C, size=(N,)).astype(np.int32)
    hw = np.asarray([70.0, 90.0], np.float32)
    with torch.no_grad():
        t_obj, t_ctx = ctx_m(
            torch.tensor(roi), torch.tensor(union), torch.tensor(pairs),
            torch.tensor(boxes), torch.tensor(hw), torch.tensor(labels),
        )
        t_preds = F.softmax(t_obj, dim=1)[:, 1:].max(1)[1] + 1
        t_rel = post(t_ctx, torch.tensor(union), torch.tensor(pairs), t_preds)

    jm = DMPContext(C, embed_dim=EMB, obj_dim=ROI, mode="sgcls")
    variables = jax.tree_util.tree_map(
        jnp.asarray,
        {
            "params": conv["params"]["context_layer"],
            "batch_stats": conv["batch_stats"]["context_layer"],
        },
    )
    dists = np.eye(C, dtype=np.float32)[labels]  # one-hot stand-in
    # parity run uses the label-embedding path like the torch mirror
    jm_pred = DMPContext(C, embed_dim=EMB, obj_dim=ROI, mode="predcls")
    j_obj_pc, j_ctx = jm_pred.apply(
        variables,
        jnp.asarray(roi)[None], jnp.asarray(union)[None],
        jnp.asarray(pairs.astype(np.int32))[None],
        jnp.asarray(boxes)[None], jnp.ones((1, N), bool),
        jnp.ones((1, P), bool), jnp.asarray(hw)[None],
        labels=jnp.asarray(labels)[None],
    )
    np.testing.assert_allclose(np.asarray(j_ctx[0]), t_ctx.numpy(), atol=2e-4)

    # relation_infer chain on converted params
    p = conv["params"]
    ctx = np.asarray(j_ctx[0])
    lin = lambda name, v: v @ np.asarray(p[name]["kernel"]) + np.asarray(
        p[name]["bias"]
    )
    t1 = lin("w_proj1", ctx[pairs[:, 0]])
    t2 = lin("w_proj2", ctx[pairs[:, 1]])
    t3 = lin("w_proj3", union)
    t4 = np.maximum(t1 + t2, 0) - (t1 - t2) ** 2
    rel = lin("out_rel", np.maximum(t4 + t3, 0) - (t4 - t3) ** 2)
    preds = t_preds.numpy()
    idx = (preds[pairs[:, 0]] - 1) * (C - 1) + (preds[pairs[:, 1]] - 1)
    lf = np.asarray(p["freq_bias"]["pred_baseline"])[idx]
    lf = lf - np.log(np.exp(lf - lf.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lf.max(-1, keepdims=True)
    sig = 1.0 / (1.0 + np.exp(-lin("wp", union)))
    rel = rel + sig * lf
    np.testing.assert_allclose(rel, t_rel.numpy(), atol=2e-3)
