"""VCTree context and head.

Behavioral counterpart of pairnet/models/relation_heads/vctree_head.py +
approaches/vctree.py (config configs/vctree/*): a learned pairwise
relatedness score builds a maximum spanning tree over the objects; a
bidirectional TreeLSTM encodes object and edge contexts along the tree; the
score matrix is additionally trained with a binary auxiliary loss against
the GT relation pairs (ref: vctree_head.py:120-170).

TPU-first deviations (documented):
* the reference converts the spanning tree to a binary tree
  (left-child/right-sibling) and runs a binary TreeLSTM
  (approaches/vctree.py:23-103); here a ChildSum TreeLSTM runs directly on
  the multi-way tree via masked level scans (same information flow,
  fixed shapes),
* the MST is built with Prim's algorithm in a fori_loop (the reference
  builds it host-side with python recursion, vctree_util.py).
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


def prim_mst(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Maximum spanning tree via Prim. scores (N, N) symmetricized.

    Returns parent (N,) int32; the root (max total score among valid) has
    parent -1; invalid nodes have parent -1.
    """
    N = scores.shape[0]
    sym = (scores + scores.T) / 2.0
    neg = -jnp.inf
    sym = jnp.where(valid[:, None] & valid[None, :], sym, neg)
    root = jnp.argmax(jnp.where(valid, jnp.where(valid[None, :], sym, 0).sum(1), neg))

    in_tree = jnp.zeros((N,), bool).at[root].set(True)
    parent = jnp.full((N,), -1, jnp.int32)

    def body(_, state):
        in_tree, parent = state
        # best edge from tree to non-tree
        cand = jnp.where(in_tree[:, None] & ~in_tree[None, :] & valid[None, :], sym, neg)
        flat = jnp.argmax(cand)
        i, j = flat // N, flat % N
        ok = cand.reshape(-1)[flat] > neg
        parent = jnp.where(ok, parent.at[j].set(i.astype(jnp.int32)), parent)
        in_tree = jnp.where(ok, in_tree.at[j].set(True), in_tree)
        return in_tree, parent

    _, parent = jax.lax.fori_loop(0, N - 1, body, (in_tree, parent))
    return parent


def tree_depths(parent: jnp.ndarray) -> jnp.ndarray:
    """Depth per node from parent pointers: walk up one step per iteration
    (N iterations bound the longest path; N is small here)."""
    N = parent.shape[0]

    def body(_, st):
        d, a = st
        moved = parent[a] >= 0
        d = d + moved.astype(jnp.int32)
        a = jnp.where(moved, parent[a], a)
        return d, a

    d, _ = jax.lax.fori_loop(0, N, body, (jnp.zeros((N,), jnp.int32), jnp.arange(N)))
    return d


class ChildSumTreeCell(nn.Module):
    """ChildSum TreeLSTM cell used for both bottom-up and top-down passes."""

    hidden: int

    @nn.compact
    def __call__(self, x, h_sum, c_sum):
        z = nn.Dense(4 * self.hidden, name="wx")(x) + nn.Dense(
            4 * self.hidden, use_bias=False, name="wh"
        )(h_sum)
        i, f, o, g = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c_sum + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return h, c


class BiTreeLSTM(nn.Module):
    """Bottom-up + top-down TreeLSTM over parent pointers (masked levels)."""

    hidden: int

    @nn.compact
    def __call__(self, x, parent, valid):  # x (N, D)
        N = x.shape[0]
        depth = tree_depths(parent)
        max_d = N  # static bound
        up_cell = ChildSumTreeCell(self.hidden, name="up")
        down_cell = ChildSumTreeCell(self.hidden, name="down")

        # bottom-up: process deepest level first
        h = jnp.zeros((N, self.hidden))
        c = jnp.zeros((N, self.hidden))
        safe_parent = jnp.clip(parent, 0, N - 1)
        for lvl in range(max_d - 1, -1, -1):
            sel = (depth == lvl) & valid
            # children sums: scatter h/c into parents
            h_sum = jnp.zeros_like(h).at[safe_parent].add(
                jnp.where((parent >= 0)[:, None], h, 0.0)
            )
            c_sum = jnp.zeros_like(c).at[safe_parent].add(
                jnp.where((parent >= 0)[:, None], c, 0.0)
            )
            h_new, c_new = up_cell(x, h_sum, c_sum)
            h = jnp.where(sel[:, None], h_new, h)
            c = jnp.where(sel[:, None], c_new, c)
        h_up = h

        # top-down: root first
        h = jnp.zeros((N, self.hidden))
        c = jnp.zeros((N, self.hidden))
        for lvl in range(0, max_d):
            sel = (depth == lvl) & valid
            h_par = jnp.where((parent >= 0)[:, None], h[safe_parent], 0.0)
            c_par = jnp.where((parent >= 0)[:, None], c[safe_parent], 0.0)
            h_new, c_new = down_cell(x, h_par, c_par)
            h = jnp.where(sel[:, None], h_new, h)
            c = jnp.where(sel[:, None], c_new, c)
        return jnp.concatenate([h_up, h], axis=-1)


class VCTreeContext(nn.Module):
    """Relatedness scores -> MST -> BiTreeLSTM object/edge contexts."""

    num_classes: int
    mode: str = "predcls"
    embed_dim: int = 200
    hidden_dim: int = 512
    roi_dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats, boxes, valid, img_hw, labels=None, dists=None):
        C = self.num_classes
        obj_embed1 = self.param(
            "obj_embed1", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        obj_embed2 = self.param(
            "obj_embed2", nn.initializers.normal(1.0), (C, self.embed_dim)
        )
        if self.mode == "predcls" and labels is not None:
            emb = obj_embed1[jnp.clip(labels, 0, C - 1)]
        else:
            emb = jax.lax.stop_gradient(dists) @ obj_embed1

        # relatedness scores (all projections are pointwise -> batched)
        pos = jax.vmap(encode_box_info)(boxes, img_hw)
        box_e = nn.relu(nn.Dense(128, name="box_embed")(pos))
        ov = jax.vmap(overlap_info)(boxes, valid)
        ov_e = nn.relu(nn.Dense(128, name="overlap_embed")(ov))
        o_red = nn.Dense(128, name="obj_reduce")(roi_feats)
        e_red = nn.Dense(128, name="emb_reduce")(emb)
        pre = nn.relu(
            nn.Dense(self.hidden_dim, name="score_pre")(
                jnp.concatenate([o_red, e_red, box_e, ov_e], -1)
            )
        )
        sub = nn.Dense(self.hidden_dim, name="score_sub")(pre)
        obj = nn.Dense(self.hidden_dim, name="score_obj")(pre)
        scores = jnp.einsum(
            "bnd,bmd->bnm", sub, obj, preferred_element_type=jnp.float32
        ) / jnp.sqrt(float(self.hidden_dim))
        B, N, _ = scores.shape
        prior_in = jnp.concatenate(
            [
                jnp.broadcast_to(sub[:, :, None], (B, N, N, self.hidden_dim)),
                jnp.broadcast_to(obj[:, None, :], (B, N, N, self.hidden_dim)),
                sub[:, :, None] * obj[:, None, :],
            ],
            -1,
        )
        prior = nn.Dense(1, name="vision_prior")(prior_in)[..., 0]
        rel_scores = jax.nn.sigmoid(scores) * jax.nn.sigmoid(prior)
        parent = jax.vmap(prim_mst)(jax.lax.stop_gradient(rel_scores), valid)

        pos128 = nn.relu(nn.Dense(128, name="pos_embed")(pos))
        obj_pre = jnp.concatenate([roi_feats, emb, pos128], -1)

        vtree = nn.vmap(
            BiTreeLSTM,
            in_axes=(0, 0, 0),
            out_axes=0,
            variable_axes={"params": None},
            split_rngs={"params": False},
        )
        enc = vtree(self.hidden_dim, name="obj_ctx_rnn")(obj_pre, parent, valid)
        enc = nn.Dense(self.hidden_dim, name="lin_obj_h")(enc)

        if self.mode == "predcls" and labels is not None:
            obj_preds = labels
            obj_dists = jax.nn.one_hot(jnp.clip(labels, 0, C - 1), C)
        else:
            obj_dists = nn.Dense(C, name="out_obj")(
                jnp.concatenate([obj_pre, enc], -1)
            )
            obj_preds = obj_dists[..., 1:].argmax(-1).astype(jnp.int32) + 1

        emb2 = obj_embed2[jnp.clip(obj_preds, 0, C - 1)]
        edge_in = jnp.concatenate([emb2, roi_feats, enc], -1)
        edge = vtree(self.hidden_dim, name="edge_ctx_rnn")(edge_in, parent, valid)
        edge_ctx = nn.Dense(self.hidden_dim, name="lin_edge_h")(edge)
        return obj_dists, obj_preds, edge_ctx, rel_scores


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
            "relatedness": rel_mat,  # for the auxiliary binary loss
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
