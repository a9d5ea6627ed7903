"""VCTree conversion numerics vs pure-torch reference mirrors.

Torch mirrors of the binary TreeLSTM cells with the reference's RECURSIVE
tree walk (ref: treelstm_util.py:99-360), the root-to-leaves decoder with
label-embedding passing (ref: vctree.py:23-103 + treelstm_util.py:382-405),
and the vision-prior score stack (ref: vctree.py:380-425); the converted
flax level-sweep implementations must match on a random binary tree.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from pairnet_tpu.models.heads.twostage.vctree import (  # noqa: E402
    BiTreeLSTM,
    DecoderTreeCell,
    gen_vctree_binary,
)
from pairnet_tpu.utils.torch_convert import convert_vctree_head  # noqa: E402

torch.manual_seed(0)
C = 8      # classes incl bg
HID = 12   # even (bidirectional halves)
EMB = 6
D = 10     # input feature dim
N = 7


class TorchFwdCell(tnn.Module):
    def __init__(self, in_dim, h):
        super().__init__()
        self.px = tnn.Linear(in_dim, h)
        self.ioffux = tnn.Linear(in_dim, 6 * h)
        self.ioffuh_left = tnn.Linear(h, 6 * h)
        self.ioffuh_right = tnn.Linear(h, 6 * h)
        self.h = h

    def node(self, x, lc, rc, lh, rh):
        z = self.ioffux(x) + self.ioffuh_left(lh) + self.ioffuh_right(rh)
        i, o, fl, fr, u, r = torch.split(z, self.h, dim=-1)
        c = torch.sigmoid(i) * torch.tanh(u) + torch.sigmoid(fl) * lc + \
            torch.sigmoid(fr) * rc
        h = torch.sigmoid(o) * torch.tanh(c)
        r = torch.sigmoid(r)
        return c, r * h + (1 - r) * self.px(x)


class TorchBwdCell(tnn.Module):
    def __init__(self, in_dim, h):
        super().__init__()
        self.px = tnn.Linear(in_dim, h)
        self.iofux = tnn.Linear(in_dim, 5 * h)
        self.iofuh = tnn.Linear(h, 5 * h)
        self.h = h

    def node(self, x, pc, ph):
        z = self.iofux(x) + self.iofuh(ph)
        i, o, f, u, r = torch.split(z, self.h, dim=-1)
        c = torch.sigmoid(i) * torch.tanh(u) + torch.sigmoid(f) * pc
        h = torch.sigmoid(o) * torch.tanh(c)
        r = torch.sigmoid(r)
        return c, r * h + (1 - r) * self.px(x)


def _random_tree(seed):
    rng = np.random.default_rng(seed)
    s = rng.uniform(0.05, 0.95, size=(N, N)).astype(np.float32)
    valid = np.ones((N,), bool)
    bl, br, bp = (
        np.asarray(t)
        for t in gen_vctree_binary(jnp.asarray(s), jnp.asarray(valid))
    )
    return bl, br, bp, valid


def _torch_fwd_sweep(cell, x, bl, br, bp):
    h = [None] * N
    c = [None] * N
    zeros = torch.zeros(1, cell.h)

    def rec(n):
        if n < 0:
            return
        rec(int(bl[n]))
        rec(int(br[n]))
        lc = c[bl[n]] if bl[n] >= 0 else zeros
        lh = h[bl[n]] if bl[n] >= 0 else zeros
        rc = c[br[n]] if br[n] >= 0 else zeros
        rh = h[br[n]] if br[n] >= 0 else zeros
        c[n], h[n] = cell.node(x[n : n + 1], lc, rc, lh, rh)

    root = int(np.where(bp < 0)[0][0])
    rec(root)
    return torch.cat(h, 0)


def _torch_bwd_sweep(cell, x, bl, br, bp):
    h = [None] * N
    c = [None] * N
    zeros = torch.zeros(1, cell.h)

    def rec(n):
        if n < 0:
            return
        pc = c[bp[n]] if bp[n] >= 0 else zeros
        ph = h[bp[n]] if bp[n] >= 0 else zeros
        c[n], h[n] = cell.node(x[n : n + 1], pc, ph)
        rec(int(bl[n]))
        rec(int(br[n]))

    root = int(np.where(bp < 0)[0][0])
    rec(root)
    return torch.cat(h, 0)


def test_bitreelstm_parity():
    half = HID // 2
    fwd = TorchFwdCell(D, half)
    bwd = TorchBwdCell(D, half)
    sd = {}
    base = "relation_head.context_layer.obj_ctx_rnn.multi_layer_lstm.0"
    for k, v in fwd.state_dict().items():
        sd[f"{base}.treeLSTM_foreward.treeLSTM.{k}"] = v
    for k, v in bwd.state_dict().items():
        sd[f"{base}.treeLSTM_backward.treeLSTM.{k}"] = v
    # pad required keys for the converter's context essentials
    conv_params = None
    try:
        conv = convert_vctree_head(sd)
    except KeyError:
        # converter needs the full context; extract just the tree part via
        # the private helper instead
        from pairnet_tpu.utils.torch_convert import _btree_lstm, unflatten

        p = {}
        _btree_lstm(p, "obj_ctx_rnn", sd, "relation_head.context_layer.obj_ctx_rnn")
        conv_params = unflatten(p)["obj_ctx_rnn"]
    if conv_params is None:
        conv_params = conv["params"]["context_layer"]["obj_ctx_rnn"]

    bl, br, bp, valid = _random_tree(5)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(N, D)).astype(np.float32)
    with torch.no_grad():
        t_f = _torch_fwd_sweep(fwd, torch.tensor(x), bl, br, bp)
        t_b = _torch_bwd_sweep(bwd, torch.tensor(x), bl, br, bp)
        t_out = torch.cat([t_f, t_b], -1)

    jm = BiTreeLSTM(HID)
    j_out = jm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, conv_params)},
        jnp.asarray(x), jnp.asarray(bl), jnp.asarray(br), jnp.asarray(bp),
        jnp.asarray(valid),
    )
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(), atol=2e-4)


def test_decoder_tree_parity():
    cell = TorchBwdCell(D + EMB, HID)
    embed = tnn.Embedding(C + 1, EMB)
    out = tnn.Linear(HID, C)
    sd = {}
    dec = "relation_head.context_layer.decoder_rnn"
    for k, v in cell.state_dict().items():
        sd[f"{dec}.decoderLSTM.{k}"] = v
    sd[f"{dec}.obj_embed.weight"] = embed.weight.detach()
    sd[f"{dec}.out.weight"] = out.weight.detach()
    sd[f"{dec}.out.bias"] = out.bias.detach()
    from pairnet_tpu.utils.torch_convert import _linear, _t, unflatten

    p = {}
    p["obj_embed"] = _t(sd[f"{dec}.obj_embed.weight"])
    _linear(p, "out", sd, f"{dec}.out")
    for n in ("px", "iofux", "iofuh"):
        _linear(p, f"decoderLSTM/{n}", sd, f"{dec}.decoderLSTM.{n}")
    conv_params = unflatten(p)

    bl, br, bp, valid = _random_tree(7)
    rng = np.random.default_rng(8)
    x = rng.normal(size=(N, D)).astype(np.float32)

    # torch mirror with embed passing (treelstm_util pass_embed_postprocess,
    # eval path: argmax over foreground, embed(label + 1))
    h = [None] * N
    c = [None] * N
    dists = [None] * N
    lbls = [None] * N
    zeros = torch.zeros(1, HID)

    def rec(n):
        if n < 0:
            return
        if bp[n] >= 0:
            pc, ph = c[bp[n]], h[bp[n]]
            pe = embed(torch.tensor([lbls[bp[n]] + 1]))
        else:
            pc, ph = zeros, zeros
            pe = embed.weight[0:1]
        inp = torch.cat([torch.tensor(x[n : n + 1]), pe], -1)
        c[n], h[n] = cell.node(inp, pc, ph)
        d = out(h[n])
        dists[n] = d
        lbls[n] = int(d[0, 1:].argmax()) + 1
        rec(int(bl[n]))
        rec(int(br[n]))

    root = int(np.where(bp < 0)[0][0])
    with torch.no_grad():
        rec(root)
    t_dists = torch.cat(dists, 0)
    t_lbls = np.asarray(lbls)

    jm = DecoderTreeCell(C, EMB, HID)
    j_dists, j_lbls = jm.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, conv_params)},
        jnp.asarray(x), jnp.asarray(bp), jnp.asarray(valid),
    )
    np.testing.assert_array_equal(np.asarray(j_lbls), t_lbls)
    np.testing.assert_allclose(np.asarray(j_dists), t_dists.numpy(), atol=2e-4)
