"""VCTree context and head (reference-exact binary TreeLSTM).

Behavioral counterpart of pairnet/models/relation_heads/vctree_head.py +
approaches/{vctree.py, treelstm_util.py, vctree_util.py}
(config configs/vctree/*):

* relatedness scores = sigmoid(vision_prior([sub*obj, sub, obj])) over a
  512-d score stack fed by DETACHED reduced roi/emb + box/overlap embeds
  (ref: vctree.py:380-425 vctree_score_net, forward:320-338),
* a greedy max-score tree (root = argmax row-mean; iteratively attach the
  best (selected, remaining) edge, ref: vctree_util.py:15-100 gen_tree)
  converted to a BINARY left-child/right-sibling tree
  (ref: vctree_util.py:103-135),
* bidirectional binary TreeLSTMs: leaves-to-root cell with separate
  left/right hidden projections + highway (ioffux/ioffuh_left/ioffuh_right/
  px, gates i,o,f_l,f_r,u,r), root-to-leaves cell (iofux/iofuh/px, gates
  i,o,f,u,r) (ref: treelstm_util.py:99-360),
* a root-to-leaves DecoderTreeLSTM that passes predicted-label embeddings
  down the binary tree (ref: vctree.py:23-103, treelstm_util.py:382-405),
* MOTIFS-style post decode (post_emb/post_cat/rel_compress/up_dim)
  (ref: vctree_head.py:24-42) + auxiliary binary CE on the score logits.

The recursive host-side tree walks of the reference become fixed-shape
masked level sweeps over parent/child pointer arrays (TPU-first design).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.heads.twostage.core import encode_box_info
from pairnet_tpu.models.heads.twostage.heads import TwoStageRelationHead
from pairnet_tpu.ops.boxes import box_iou


def overlap_info(boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) overlap statistics per object (ref: vctree_util get_overlap_info):
    [sum IoU, #overlaps, mean overlap area frac, x-extent frac, y-extent
    frac, area frac]."""
    N = boxes.shape[0]
    iou, _ = box_iou(boxes, boxes)
    iou = iou * (1.0 - jnp.eye(N)) * valid[None, :]
    overlaps = (iou > 0).astype(jnp.float32)
    area = jnp.clip(boxes[:, 2] - boxes[:, 0], 0) * jnp.clip(
        boxes[:, 3] - boxes[:, 1], 0
    )
    total = jnp.maximum(area.sum(), 1.0)
    return jnp.stack(
        [
            iou.sum(1),
            overlaps.sum(1),
            (iou.sum(1) / jnp.maximum(overlaps.sum(1), 1.0)),
            jnp.clip(boxes[:, 2] - boxes[:, 0], 0) / jnp.sqrt(total),
            jnp.clip(boxes[:, 3] - boxes[:, 1], 0) / jnp.sqrt(total),
            area / total,
        ],
        axis=-1,
    )


def gen_vctree_binary(scores: jnp.ndarray, valid: jnp.ndarray):
    """Greedy tree + left-child/right-sibling binarization, fixed shape.

    scores (N, N) relatedness (higher = more related); returns
    (bi_left, bi_right, bi_parent) int32 (N,), -1 = none. Matches the
    reference exactly: root = argmax of row-mean over valid columns; each
    step attaches the (selected, remaining) pair with max DIRECTED score
    scores[sel, rem]; children keep insertion order, so the first child
    becomes the binary left child and later children chain as right
    siblings (ref: vctree_util.py:15-135).
    """
    N = scores.shape[0]
    neg = -jnp.inf
    nvalid = jnp.maximum(jnp.sum(valid), 1)
    node_scores = jnp.where(
        valid, jnp.where(valid[None, :], scores, 0.0).sum(1), neg
    )
    # reference divides by the true N (mean over the unpadded row)
    node_scores = jnp.where(valid, node_scores / nvalid, neg)
    root = jnp.argmax(node_scores).astype(jnp.int32)

    selected = jnp.zeros((N,), bool).at[root].set(True)
    bi_left = jnp.full((N,), -1, jnp.int32)
    bi_right = jnp.full((N,), -1, jnp.int32)
    bi_parent = jnp.full((N,), -1, jnp.int32)
    last_child = jnp.full((N,), -1, jnp.int32)

    def body(_, st):
        selected, bi_left, bi_right, bi_parent, last_child = st
        cand = jnp.where(
            selected[:, None] & ~selected[None, :] & valid[None, :], scores, neg
        )
        flat = jnp.argmax(cand)
        i = (flat // N).astype(jnp.int32)
        j = (flat % N).astype(jnp.int32)
        ok = cand.reshape(-1)[flat] > neg
        has_child = last_child[i] >= 0
        prev = jnp.clip(last_child[i], 0, N - 1)
        bi_left = jnp.where(
            ok & ~has_child, bi_left.at[i].set(j), bi_left
        )
        bi_right = jnp.where(
            ok & has_child, bi_right.at[prev].set(j), bi_right
        )
        bi_parent = jnp.where(
            ok, bi_parent.at[j].set(jnp.where(has_child, prev, i)), bi_parent
        )
        last_child = jnp.where(ok, last_child.at[i].set(j), last_child)
        selected = jnp.where(ok, selected.at[j].set(True), selected)
        return selected, bi_left, bi_right, bi_parent, last_child

    _, bi_left, bi_right, bi_parent, _ = jax.lax.fori_loop(
        0, N - 1, body, (selected, bi_left, bi_right, bi_parent, last_child)
    )
    return bi_left, bi_right, bi_parent


def tree_depths(parent: jnp.ndarray) -> jnp.ndarray:
    """Depth per node from parent pointers (N sweeps bound the path)."""
    N = parent.shape[0]

    def body(_, st):
        d, a = st
        moved = parent[a] >= 0
        d = d + moved.astype(jnp.int32)
        a = jnp.where(moved, parent[a], a)
        return d, a

    d, _ = jax.lax.fori_loop(0, N, body, (jnp.zeros((N,), jnp.int32), jnp.arange(N)))
    return d


class BiFwdTreeCell(nn.Module):
    """Leaves-to-root cell (ref: treelstm_util.py:99-162 BiTreeLSTM_Foreward):
    gates (i, o, f_l, f_r, u, r) from the input + separate left/right child
    hidden projections; highway mix with px."""

    hidden: int

    @nn.compact
    def __call__(self, x, lh, lc, rh, rc):
        H = self.hidden
        z = (
            nn.Dense(6 * H, name="ioffux")(x)
            + nn.Dense(6 * H, name="ioffuh_left")(lh)
            + nn.Dense(6 * H, name="ioffuh_right")(rh)
        )
        i, o, f_l, f_r, u, r = jnp.split(z, 6, axis=-1)
        c = (
            jax.nn.sigmoid(i) * jnp.tanh(u)
            + jax.nn.sigmoid(f_l) * lc
            + jax.nn.sigmoid(f_r) * rc
        )
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        r = jax.nn.sigmoid(r)
        h = r * h + (1.0 - r) * nn.Dense(H, name="px")(x)
        return h, c


class BiBwdTreeCell(nn.Module):
    """Root-to-leaves cell (ref: treelstm_util.py:258-312 BiTreeLSTM_Backward):
    gates (i, o, f, u, r) from the input + binary-parent hidden."""

    hidden: int

    @nn.compact
    def __call__(self, x, ph, pc):
        H = self.hidden
        z = nn.Dense(5 * H, name="iofux")(x) + nn.Dense(5 * H, name="iofuh")(ph)
        i, o, f, u, r = jnp.split(z, 5, axis=-1)
        c = jax.nn.sigmoid(i) * jnp.tanh(u) + jax.nn.sigmoid(f) * pc
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        r = jax.nn.sigmoid(r)
        h = r * h + (1.0 - r) * nn.Dense(H, name="px")(x)
        return h, c


def _fwd_sweep(cell, x, bi_left, bi_right, bi_parent, valid):
    """Bottom-up masked level sweep over the binary tree -> (N, H)."""
    N = x.shape[0]
    H = cell.hidden
    depth = tree_depths(bi_parent)
    h = jnp.zeros((N, H))
    c = jnp.zeros((N, H))
    lsafe = jnp.clip(bi_left, 0, N - 1)
    rsafe = jnp.clip(bi_right, 0, N - 1)
    for lvl in range(N - 1, -1, -1):
        sel = (depth == lvl) & valid
        lh = jnp.where((bi_left >= 0)[:, None], h[lsafe], 0.0)
        lc = jnp.where((bi_left >= 0)[:, None], c[lsafe], 0.0)
        rh = jnp.where((bi_right >= 0)[:, None], h[rsafe], 0.0)
        rc = jnp.where((bi_right >= 0)[:, None], c[rsafe], 0.0)
        h_new, c_new = cell(x, lh, lc, rh, rc)
        h = jnp.where(sel[:, None], h_new, h)
        c = jnp.where(sel[:, None], c_new, c)
    return h


def _bwd_sweep(cell, x, bi_parent, valid):
    """Top-down masked level sweep over the binary tree -> (N, H)."""
    N = x.shape[0]
    H = cell.hidden
    depth = tree_depths(bi_parent)
    h = jnp.zeros((N, H))
    c = jnp.zeros((N, H))
    psafe = jnp.clip(bi_parent, 0, N - 1)
    for lvl in range(N):
        sel = (depth == lvl) & valid
        ph = jnp.where((bi_parent >= 0)[:, None], h[psafe], 0.0)
        pc = jnp.where((bi_parent >= 0)[:, None], c[psafe], 0.0)
        h_new, c_new = cell(x, ph, pc)
        h = jnp.where(sel[:, None], h_new, h)
        c = jnp.where(sel[:, None], c_new, c)
    return h


class BiTreeLSTM(nn.Module):
    """BidirectionalTreeLSTM: forward + backward halves, each hidden/2
    (ref: treelstm_util.py:36-58)."""

    hidden: int

    @nn.compact
    def __call__(self, x, bi_left, bi_right, bi_parent, valid):
        half = self.hidden // 2
        fwd = BiFwdTreeCell(half, name="fwd")
        bwd = BiBwdTreeCell(half, name="bwd")
        h_f = _fwd_sweep(fwd, x, bi_left, bi_right, bi_parent, valid)
        h_b = _bwd_sweep(bwd, x, bi_parent, valid)
        return jnp.concatenate([h_f, h_b], axis=-1)


class DecoderTreeCell(nn.Module):
    """Backward decoder step: input = [feat, parent label embedding]; the
    committed label (eval: argmax over foreground) embeds as label + 1 and
    passes to binary children (ref: vctree.py:23-103 DecoderTreeLSTM +
    treelstm_util.py:382-405 pass_embed_postprocess)."""

    num_classes: int
    embed_dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x, bi_parent, valid):
        N = x.shape[0]
        C = self.num_classes
        embed = self.param(
            "obj_embed", nn.initializers.normal(1.0), (C + 1, self.embed_dim)
        )
        cell = BiBwdTreeCell(self.hidden_dim, name="decoderLSTM")
        out = nn.Dense(C, name="out")
        depth = tree_depths(bi_parent)
        psafe = jnp.clip(bi_parent, 0, N - 1)
        h = jnp.zeros((N, self.hidden_dim))
        c = jnp.zeros((N, self.hidden_dim))
        lbl = jnp.zeros((N,), jnp.int32)  # committed label per node
        dists = jnp.zeros((N, C))
        for lvl in range(N):
            sel = (depth == lvl) & valid
            has_par = bi_parent >= 0
            # parent embedding: root uses embed row 0; others embed(lbl + 1)
            par_lbl = lbl[psafe]
            par_embed = jnp.where(
                has_par[:, None],
                embed[jnp.clip(par_lbl + 1, 0, C)],
                embed[0][None],
            )
            inp = jnp.concatenate([x, par_embed], axis=-1)
            ph = jnp.where(has_par[:, None], h[psafe], 0.0)
            pc = jnp.where(has_par[:, None], c[psafe], 0.0)
            h_new, c_new = cell(inp, ph, pc)
            dist = out(h_new)
            pred = jnp.argmax(dist[:, 1:], axis=-1).astype(jnp.int32) + 1
            h = jnp.where(sel[:, None], h_new, h)
            c = jnp.where(sel[:, None], c_new, c)
            lbl = jnp.where(sel, pred, lbl)
            dists = jnp.where(sel[:, None], dist, dists)
        return dists, lbl


class VCTreeContext(nn.Module):
    """Relatedness scores -> binary VCTree -> BiTreeLSTM contexts."""

    num_classes: int
    mode: str = "predcls"
    embed_dim: int = 200
    hidden_dim: int = 512
    roi_dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats, boxes, valid, img_hw, labels=None, dists=None):
        C = self.num_classes
        sg = jax.lax.stop_gradient
        obj_embed1 = self.param(
            "obj_embed1", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        obj_embed2 = self.param(
            "obj_embed2", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        if self.mode == "predcls" and labels is not None:
            emb = obj_embed1[jnp.clip(labels, 0, C - 1)]
            obj_dists_in = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C)
        else:
            obj_dists_in = sg(dists)
            emb = obj_dists_in @ obj_embed1

        pos9 = jax.vmap(encode_box_info)(boxes, img_hw)
        pos = nn.relu(
            nn.Dense(128, name="pos_fc2")(
                nn.BatchNorm(use_running_average=True, name="pos_bn")(
                    nn.Dense(32, name="pos_fc1")(pos9)
                )
            )
        )
        # score stack (ref forward:320-338, inputs DETACHED)
        box_e = nn.relu(
            nn.BatchNorm(use_running_average=True, name="box_bn")(
                nn.Dense(128, name="box_embed")(pos9)
            )
        )
        ov = jax.vmap(overlap_info)(boxes, valid)
        ov_e = nn.relu(
            nn.BatchNorm(use_running_average=True, name="overlap_bn")(
                nn.Dense(128, name="overlap_embed")(ov)
            )
        )
        o_red = nn.Dense(128, name="obj_reduce")(sg(roi_feats))
        e_red = nn.Dense(128, name="emb_reduce")(sg(emb))
        pre = nn.relu(
            nn.Dense(self.hidden_dim, name="score_pre")(
                jnp.concatenate([o_red, e_red, box_e, ov_e], -1)
            )
        )
        sub = nn.relu(nn.Dense(self.hidden_dim, name="score_sub")(pre))
        obj = nn.relu(nn.Dense(self.hidden_dim, name="score_obj")(pre))
        B, N, _ = sub.shape
        prior_in = jnp.concatenate(
            [
                sub[:, :, None] * obj[:, None, :],
                jnp.broadcast_to(sub[:, :, None], (B, N, N, self.hidden_dim)),
                jnp.broadcast_to(obj[:, None, :], (B, N, N, self.hidden_dim)),
            ],
            -1,
        )
        bi_logits = nn.Dense(1, name="vision_prior")(prior_in)[..., 0]
        rel_scores = jax.nn.sigmoid(bi_logits)  # (B, N, N)

        trees = jax.vmap(gen_vctree_binary)(sg(rel_scores), valid)
        bi_left, bi_right, bi_parent = trees

        obj_pre = jnp.concatenate([roi_feats, emb, pos], -1)
        vtree = nn.vmap(
            BiTreeLSTM,
            in_axes=(0, 0, 0, 0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        enc = vtree(self.hidden_dim, name="obj_ctx_rnn")(
            obj_pre, bi_left, bi_right, bi_parent, valid
        )

        if self.mode == "predcls" and labels is not None:
            obj_preds = labels
            obj_dists = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C)
        else:
            dec_in = jnp.concatenate([obj_pre, enc], -1)
            vdec = nn.vmap(
                DecoderTreeCell,
                in_axes=(0, 0, 0),
                out_axes=0,
                variable_axes={"params": None},
                split_rngs={"params": False},
            )
            obj_dists, obj_preds = vdec(
                C, self.embed_dim, self.hidden_dim, name="decoder_rnn"
            )(dec_in, bi_parent, valid)

        emb2 = obj_embed2[jnp.clip(obj_preds, 0, C - 1)]
        edge_in = jnp.concatenate([emb2, roi_feats, enc], -1)
        edge_ctx = vtree(self.hidden_dim, name="edge_ctx_rnn")(
            edge_in, bi_left, bi_right, bi_parent, valid
        )
        return obj_dists, obj_preds, edge_ctx, bi_logits


@HEADS.register()
class VCTreeHead(TwoStageRelationHead):
    """MOTIFS-style post-decode over VCTree contexts + binary tree loss."""

    def setup_head(self):
        self.context_layer = VCTreeContext(
            self.num_classes, mode=self.mode, embed_dim=self.embed_dim,
            hidden_dim=self.hidden_dim, roi_dim=self.roi_dim,
            name="context_layer",
        )
        self.post_emb = nn.Dense(self.hidden_dim * 2, name="post_emb")
        self.post_cat = nn.Dense(self.context_pooling_dim, name="post_cat")
        self.rel_compress = nn.Dense(self.num_predicates, name="rel_compress")
        if self.context_pooling_dim != self.roi_dim:
            self.up_dim = nn.Dense(self.context_pooling_dim, name="up_dim")

    def predict(self, roi_feats, union_feats, batch):
        obj_dists, obj_preds, edge_ctx, rel_mat = self.context_layer(
            roi_feats, batch["det_boxes"], batch["det_valid"],
            batch["image_shape"],
            labels=batch.get("det_labels"), dists=batch.get("det_dists"),
        )
        B, N, _ = roi_feats.shape
        edge_rep = self.post_emb(edge_ctx).reshape(B, N, 2, self.hidden_dim)
        take = jax.vmap(lambda a, i: a[i])
        pairs = batch["pairs"]
        prod = jnp.concatenate(
            [take(edge_rep[:, :, 0], pairs[..., 0]),
             take(edge_rep[:, :, 1], pairs[..., 1])], -1,
        )
        prod = self.post_cat(prod)
        if self.use_vision:
            u = union_feats
            if self.context_pooling_dim != self.roi_dim:
                u = self.up_dim(u)
            prod = prod * u
        rel_scores = self.rel_compress(prod)
        if self.use_bias:
            pair_pred = jnp.stack(
                [take(obj_preds, pairs[..., 0]), take(obj_preds, pairs[..., 1])],
                -1,
            )
            rel_scores = rel_scores + self.freq_bias(pair_pred)
        return {
            "refine_scores": obj_dists,
            "obj_preds": obj_preds,
            "rel_scores": rel_scores,
            "relatedness": jax.nn.sigmoid(rel_mat),  # for the aux binary loss
        }


def vctree_binary_loss(relatedness, batch):
    """Auxiliary binary CE on the relatedness matrix vs GT related pairs
    (ref: vctree_head.py:120-170)."""
    B, N, _ = relatedness.shape
    gt = jnp.zeros((B, N, N))
    pairs = batch["pairs"]
    pos = (batch["pair_labels"] > 0) & batch["pair_valid"]

    def one(g, prs, p):
        return g.at[prs[:, 0], prs[:, 1]].max(p.astype(jnp.float32))

    gt = jax.vmap(one)(gt, pairs, pos)
    vmask = (
        batch["det_valid"][:, :, None] & batch["det_valid"][:, None, :]
    ).astype(jnp.float32)
    p = jnp.clip(relatedness, 1e-6, 1 - 1e-6)
    bce = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
    return jnp.sum(bce * vmask) / jnp.maximum(vmask.sum(), 1.0)
