"""Two-stage context encoders: MOTIFS bi-LSTM, IMP GRU-MP, GPS-Net DMP.

Behavioral counterparts of pairnet/models/relation_heads/approaches/
{motif.py, imp.py, dmp.py}, redesigned for fixed shapes: the reference packs
variable-length per-image object lists into PackedSequences and scatters over
flattened batches; here everything is (B, N)/(B, P) padded with masks, the
LSTMs are masked `lax.scan`s, and per-image logic is vmapped.

GloVe initialization of the label embeddings (ref: motif.py:286-291) is
replaced by normal init — the embedding weights convert from reference
checkpoints via utils/torch_convert.

Modes follow the reference (ref: motif.py:272-279): predcls (GT boxes+labels),
sgcls (GT boxes), sgdet (detections).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.models.heads.twostage.core import encode_box_info


class _MaskedLSTMStep(nn.Module):
    """One masked LSTM step for nn.scan: invalid steps hold the carry."""

    hidden: int

    @nn.compact
    def __call__(self, carry, inp):
        xt, mt = inp  # (B, D), (B, 1)
        cell = nn.OptimizedLSTMCell(self.hidden, name="cell")
        new_carry, yt = cell(carry, xt)
        keep = lambda new, old: jnp.where(mt, new, old)
        carry = jax.tree_util.tree_map(keep, new_carry, carry)
        return carry, jnp.where(mt, yt, 0.0)


class MaskedLSTM(nn.Module):
    """Unidirectional masked LSTM over axis 1 (time axis scanned)."""

    hidden: int
    reverse: bool = False

    @nn.compact
    def __call__(self, x, mask):  # x (B, N, D), mask (B, N)
        B = x.shape[0]
        init = nn.OptimizedLSTMCell(self.hidden, parent=None).initialize_carry(
            jax.random.PRNGKey(0), (B, x.shape[-1])
        )
        xs = jnp.swapaxes(x, 0, 1)  # (N, B, D)
        ms = jnp.swapaxes(mask, 0, 1)[..., None].astype(bool)
        if self.reverse:
            xs = xs[::-1]
            ms = ms[::-1]
        scan = nn.scan(
            _MaskedLSTMStep,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        _, ys = scan(self.hidden, name="step")(init, (xs, ms))
        if self.reverse:
            ys = ys[::-1]
        return jnp.swapaxes(ys, 0, 1)  # (B, N, H)


class MaskedBiLSTM(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x, mask):
        f = MaskedLSTM(self.hidden, name="fwd")(x, mask)
        b = MaskedLSTM(self.hidden, reverse=True, name="bwd")(x, mask)
        return jnp.concatenate([f, b], axis=-1)


def sort_by_x(boxes, valid):
    """Per-image left-right sort permutation (descending score = cx/(max+1),
    ref: motif.py:362-366); invalid slots last. Returns (perm, inv_perm)."""
    cx = (boxes[:, 0] + boxes[:, 2]) / 2.0
    score = cx / (jnp.max(jnp.where(valid, cx, 0.0)) + 1.0)
    key = jnp.where(valid, score, -jnp.inf)
    perm = jnp.argsort(-key)
    inv = jnp.argsort(perm)
    return perm, inv


class _DecoderStep(nn.Module):
    """One step of the sequential label decoder (see DecoderRNN).

    The cell is the reference's custom highway LSTM — input_linearity
    projects the input to SIX gate chunks (i, f, g, o, highway gate,
    highway input), state_linearity the hidden state to FIVE
    (ref: motif.py:92-170 lstm_equations) — NOT a standard LSTM cell;
    matching it exactly is what makes reference checkpoints convertible.
    """

    num_classes: int
    embed_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, carry, inp):
        (h_prev, c_prev), prev_lbl = carry
        xt, mt, lt = inp  # (B, D), (B,), (B,) with -1 = no teacher forcing
        H = self.hidden_dim
        embed = self.param(
            "obj_embed", nn.initializers.normal(1.0),
            (self.num_classes + 1, self.embed_dim),
        )
        inp_t = jnp.concatenate(
            [xt, embed[jnp.clip(prev_lbl + 1, 0, self.num_classes)]], axis=-1
        )
        pi = nn.Dense(6 * H, name="input_linearity")(inp_t)
        ps = nn.Dense(5 * H, name="state_linearity")(h_prev)
        gate = lambda k: pi[:, k * H : (k + 1) * H] + ps[:, k * H : (k + 1) * H]
        i = jax.nn.sigmoid(gate(0))
        f = jax.nn.sigmoid(gate(1))
        g = jnp.tanh(gate(2))
        o = jax.nn.sigmoid(gate(3))
        c_new = i * g + f * c_prev
        ht = o * jnp.tanh(c_new)
        hw = jax.nn.sigmoid(gate(4))
        ht = hw * ht + (1.0 - hw) * pi[:, 5 * H : 6 * H]
        dist = nn.Dense(self.num_classes, name="out_obj")(ht)
        pred = jnp.argmax(dist[:, 1:], axis=-1).astype(jnp.int32) + 1
        # teacher forcing when a label is given; bg(0)/sentinel use argmax.
        # The emitted prediction IS the committed label (ref: motif.py
        # out_commitments appends labels_to_embed when labels are given).
        nxt = jnp.where(lt > 0, lt, pred)
        keep = lambda new, old: jnp.where(mt[:, None], new, old)
        h_new = keep(ht, h_prev)
        c_new = keep(c_new, c_prev)
        nxt = jnp.where(mt, nxt, prev_lbl)
        return ((h_new, c_new), nxt), (dist, jnp.where(mt, nxt, 0))


class DecoderRNN(nn.Module):
    """Sequential label decoder (ref: motif.py:70-258): an LSTM over the
    sorted objects whose input includes the embedding of the previous
    predicted (or teacher-forced) label. The reference's per-class NMS
    suppression inside the decode loop (boxes_for_nms) applies only to
    sgdet and is omitted here (documented deviation)."""

    num_classes: int  # including background at 0
    embed_dim: int = 200
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, x, mask, labels=None):  # x (B, N, D) sorted
        B, N, D = x.shape
        init_carry = (
            jnp.zeros((B, self.hidden_dim)),
            jnp.zeros((B, self.hidden_dim)),
        )
        xs = jnp.swapaxes(x, 0, 1)
        ms = jnp.swapaxes(mask, 0, 1)
        # teacher-forcing labels; -1 sentinel means "use own prediction"
        if labels is None:
            lbls = jnp.full((N, B), -1, jnp.int32)
        else:
            lbls = jnp.swapaxes(labels, 0, 1).astype(jnp.int32)

        scan = nn.scan(
            _DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        carry0 = (init_carry, jnp.zeros((B,), jnp.int32) - 1)
        _, (dists, preds) = scan(
            self.num_classes, self.embed_dim, self.hidden_dim, name="step"
        )(carry0, (xs, ms, lbls))
        return jnp.swapaxes(dists, 0, 1), jnp.swapaxes(preds, 0, 1)


class LSTMContext(nn.Module):
    """MOTIFS context (ref: motif.py:259-520), batched fixed-shape."""

    num_classes: int  # with background (labels 1-based, 0 = bg)
    mode: str = "predcls"  # predcls | sgcls | sgdet
    embed_dim: int = 200
    hidden_dim: int = 512
    roi_dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats, boxes, valid, img_hw, labels=None, dists=None):
        """roi_feats (B, N, roi_dim); boxes (B, N, 4); labels (B, N) 1-based.

        Returns (obj_dists (B, N, C), obj_preds (B, N), edge_ctx (B, N, H)).
        """
        C = self.num_classes
        obj_embed1 = self.param(
            "obj_embed1", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        obj_embed2 = self.param(
            "obj_embed2", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        pos_fc1 = nn.Dense(32, name="pos_fc1")
        pos_bn = nn.BatchNorm(use_running_average=True, name="pos_bn", momentum=0.999)
        pos_fc2 = nn.Dense(128, name="pos_fc2")

        if self.mode == "predcls":
            emb = obj_embed1[jnp.clip(labels, 0, C - 1)]
        else:
            d = jax.lax.stop_gradient(dists)
            emb = d @ obj_embed1

        pos = jax.vmap(lambda b, hw: encode_box_info(b, hw))(boxes, img_hw)
        pos = nn.relu(pos_fc2(pos_bn(pos_fc1(pos))))

        obj_pre = jnp.concatenate([roi_feats, emb, pos], axis=-1)

        perm, inv = jax.vmap(sort_by_x)(boxes, valid)
        take = jax.vmap(lambda a, i: a[i])
        sorted_feats = take(obj_pre, perm)
        sorted_mask = take(valid, perm)

        enc = MaskedBiLSTM(self.hidden_dim, name="obj_ctx_rnn")(
            sorted_feats, sorted_mask
        )
        enc = nn.Dense(self.hidden_dim, name="lin_obj_h")(enc)

        if self.mode == "predcls":
            obj_preds = labels
            obj_dists = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C)
            enc_unsorted = take(enc, inv)
        else:
            dec_in = jnp.concatenate([sorted_feats, enc], axis=-1)
            sorted_labels = None if labels is None else take(labels, perm)
            d_dists, d_preds = DecoderRNN(
                C, self.embed_dim, self.hidden_dim, name="decoder_rnn"
            )(dec_in, sorted_mask, sorted_labels)
            obj_dists = take(d_dists, inv)
            obj_preds = take(d_preds, inv)
            enc_unsorted = take(enc, inv)

        emb2 = obj_embed2[jnp.clip(obj_preds, 0, C - 1)]
        edge_in = jnp.concatenate([emb2, roi_feats, enc_unsorted], axis=-1)
        sorted_edge = take(edge_in, perm)
        edge = MaskedBiLSTM(self.hidden_dim, name="edge_ctx_rnn")(
            sorted_edge, sorted_mask
        )
        edge = nn.Dense(self.hidden_dim, name="lin_edge_h")(edge)
        edge_ctx = take(edge, inv)
        return obj_dists, obj_preds, edge_ctx


class IMPContext(nn.Module):
    """Iterative message passing (ref: approaches/imp.py:17-170), fixed-shape.

    Exact reference semantics: node/edge GRUs (torch GRUCell math), EDGE
    messages gated by sub_vert_w_fc / obj_vert_w_fc on the endpoint states,
    NODE messages = incidence-matmul of out_edge_w_fc / in_edge_w_fc -gated
    edge states (no normalization). Padded pairs contribute nothing to the
    node scatter; padded objects are masked at the loss.
    """

    num_classes: int
    num_predicates: int  # with background
    hidden_dim: int = 512
    num_iter: int = 2
    mode: str = "predcls"

    @nn.compact
    def __call__(self, roi_feats, union_feats, pairs, obj_valid, pair_valid,
                 labels=None):
        """roi_feats (B,N,D); union_feats (B,P,D); pairs (B,P,2)."""
        H = self.hidden_dim
        obj_rep = nn.Dense(H, name="obj_unary")(roi_feats)
        rel_rep = nn.relu(nn.Dense(H, name="edge_unary")(union_feats))
        node_gru = nn.GRUCell(H, name="node_gru")
        edge_gru = nn.GRUCell(H, name="edge_gru")
        sub_w = nn.Dense(1, name="sub_vert_w_fc")
        obj_w = nn.Dense(1, name="obj_vert_w_fc")
        out_w = nn.Dense(1, name="out_edge_w_fc")
        in_w = nn.Dense(1, name="in_edge_w_fc")

        B, N, _ = roi_feats.shape
        P = pairs.shape[1]
        sub_idx = pairs[..., 0]  # (B, P)
        obj_idx = pairs[..., 1]
        pv = pair_valid.astype(jnp.float32)[..., None]

        # vert_factor[0] / edge_factor[0]: GRU step from zero hidden state
        vert, _ = node_gru(jnp.zeros((B, N, H)), obj_rep)
        edge, _ = edge_gru(jnp.zeros((B, P, H)), rel_rep)

        take = jax.vmap(lambda a, i: a[i])
        for _ in range(self.num_iter):
            sub_h = take(vert, sub_idx)  # (B, P, H)
            obj_h = take(vert, obj_idx)
            # edge message: gated endpoint states (ref: imp.py:124-135)
            w_s = jax.nn.sigmoid(sub_w(jnp.concatenate([sub_h, edge], -1)))
            w_o = jax.nn.sigmoid(obj_w(jnp.concatenate([obj_h, edge], -1)))
            edge_msg = w_s * sub_h + w_o * obj_h
            new_edge, _ = edge_gru(edge, edge_msg)
            # node message: incidence-matmul of gated edge states
            # (ref: imp.py:138-148, sub2rel @ pre_out + obj2rel @ pre_in)
            pre_out = jax.nn.sigmoid(
                out_w(jnp.concatenate([sub_h, edge], -1))
            ) * edge * pv
            pre_in = jax.nn.sigmoid(
                in_w(jnp.concatenate([obj_h, edge], -1))
            ) * edge * pv

            def scatter(msg, idx):
                return jax.vmap(
                    lambda m, i: jnp.zeros((N, H)).at[i].add(m)
                )(msg, idx)

            vert_ctx = scatter(pre_out, sub_idx) + scatter(pre_in, obj_idx)
            vert, _ = node_gru(vert, vert_ctx)
            edge = new_edge

        if self.mode == "predcls" and labels is not None:
            obj_dists = jax.nn.one_hot(
                jnp.clip(labels, 0, self.num_classes - 1), self.num_classes
            )
        else:
            obj_dists = nn.Dense(self.num_classes, name="obj_fc")(vert)
        rel_dists = nn.Dense(self.num_predicates, name="rel_fc")(edge)
        return obj_dists, rel_dists


class DMPContext(nn.Module):
    """GPS-Net direction-aware message passing (ref: approaches/dmp.py:23-170).

    Exact reference semantics on the VALID subgraph: attention = sigmoid of
    the scattered pair coefficients with zero diagonal (absent ordered pairs
    among valid objects keep sigmoid(0) = 0.5 like the reference), row-
    normalized; context = [A @ W_t3(x), A^T @ W_t3(x)] -> trans; output
    features relu(x + trans) (ref: dmp.py:87-160).
    """

    num_classes: int
    embed_dim: int = 200
    obj_dim: int = 1024
    mode: str = "predcls"

    @nn.compact
    def __call__(self, roi_feats, union_feats, pairs, boxes, valid, pair_valid,
                 img_hw, labels=None, dists=None):
        C = self.num_classes
        obj_embed = self.param(
            "obj_embed", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        if self.mode == "predcls" and labels is not None:
            emb = obj_embed[jnp.clip(labels, 0, C - 1)]
        else:
            emb = jax.lax.stop_gradient(dists) @ obj_embed
        pos = jax.vmap(lambda b, hw: encode_box_info(b, hw))(boxes, img_hw)
        pos = nn.relu(
            nn.Dense(128, name="pos_fc2")(
                nn.BatchNorm(use_running_average=True, name="pos_bn")(
                    nn.Dense(32, name="pos_fc1")(pos)
                )
            )
        )
        x = nn.relu(
            nn.Dense(self.obj_dim, name="project_input")(
                jnp.concatenate([roi_feats, emb, pos], -1)
            )
        )

        ws = nn.Dense(self.obj_dim, name="ws")
        wo = nn.Dense(self.obj_dim, name="wo")
        wu = nn.Dense(self.obj_dim, name="wu")
        w1 = nn.Dense(1, name="w")
        w_t3 = nn.Dense(self.obj_dim // 2, name="W_t3")
        trans = nn.Sequential(
            [
                nn.Dense(self.obj_dim // 4, name="t1"),
                nn.LayerNorm(epsilon=1e-5, name="t_ln"),
                nn.relu,
                nn.Dense(self.obj_dim, name="t2"),
            ]
        )

        B, N, _ = x.shape
        take = jax.vmap(lambda a, i: a[i])
        sub_f = take(x, pairs[..., 0])
        obj_f = take(x, pairs[..., 1])
        coeff = w1(ws(sub_f) * wo(obj_f) * wu(union_feats))[..., 0]  # (B, P)

        # attention (ref get_attention): scatter-ADD coefficients, sigmoid,
        # zero diagonal; valid-object masking replaces the reference's
        # variable N (padded rows/cols contribute nothing)
        def build_attn(c, prs, pvalid, v):
            a = jnp.zeros((N, N)).at[prs[:, 0], prs[:, 1]].add(
                jnp.where(pvalid, c, 0.0)
            )
            a = jax.nn.sigmoid(a) * (1.0 - jnp.eye(N))
            vm = v.astype(jnp.float32)
            a = a * vm[:, None] * vm[None, :]
            return a / jnp.maximum(a.sum(axis=1, keepdims=True), 1e-6)

        attn = jax.vmap(build_attn)(coeff, pairs, pair_valid, valid)
        t3 = nn.relu(w_t3(x))  # (B, N, obj_dim/2)
        ctx = jnp.concatenate(
            [
                jnp.einsum("bnm,bmd->bnd", attn, t3),
                jnp.einsum("bmn,bmd->bnd", attn, t3),
            ],
            -1,
        )  # (B, N, obj_dim): [A @ t3, A^T @ t3] (ref dmp.py:16-21 matmul)
        x = nn.relu(x + trans(ctx))
        x = x * valid[..., None]

        if self.mode == "predcls" and labels is not None:
            obj_dists = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C)
        else:
            obj_dists = nn.Dense(C, name="out_obj")(x)
        return obj_dists, x
