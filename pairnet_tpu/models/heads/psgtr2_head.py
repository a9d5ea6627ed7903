"""PSGTr2: PSGTr re-based on the Mask2Former pixel decoder.

Behavioral counterpart of pairnet/models/relation_heads/psgtr_head2.py
(config configs/psgtr/psgtr_r50_psg_plus.py): the MSDeformAttn pixel decoder
+ masked-attention query decoder produce per-query features; every query
predicts a full triplet — subject/object class + subject/object mask (two
separate mask-embed MLPs against the shared stride-4 mask features) and the
predicate. Matching is ``MaskHTriMatcher``: Hungarian over summed
classification + point-sampled mask BCE + dice costs for BOTH subject and
object plus the predicate cost (ref: approaches/matcher.py:10-104; costs
s_cls 2 / mask 5 / dice 5, o same, r_cls 2).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.decoders.mask2former_decoder import Mask2FormerDecoder
from pairnet_tpu.models.heads.baseline_head import baseline_postprocess
from pairnet_tpu.models.layers import MLP, sine_positional_encoding
from pairnet_tpu.models.losses import naive_dice_loss, sigmoid_bce
from pairnet_tpu.models.matchers import (
    bce_mask_cost,
    classification_cost,
    dice_cost,
    sample_points_for_matching,
)
from pairnet_tpu.models.necks.pixel_decoder import MSDeformAttnPixelDecoder
from pairnet_tpu.ops.hungarian import hungarian
from pairnet_tpu.ops.sampling import sample_mask_points


@HEADS.register()
class PSGTr2Head(nn.Module):
    num_classes: int = 133
    num_relations: int = 56
    num_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_decoder_layers: int = 9
    num_feat_levels: int = 3
    pixel_decoder_layers: int = 6

    def setup(self):
        C = self.embed_dims
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=C, out_channels=C,
            num_encoder_levels=self.num_feat_levels,
            num_encoder_layers=self.pixel_decoder_layers,
            num_heads=self.num_heads,
            name="pixel_decoder",
        )
        self.transformer_decoder = Mask2FormerDecoder(
            num_classes=self.num_classes,
            num_queries=self.num_query,
            embed_dims=C,
            num_heads=self.num_heads,
            num_layers=self.num_decoder_layers,
            num_feat_levels=self.num_feat_levels,
            out_channels=C,
            name="transformer_decoder",
        )
        self.sub_cls_embed = nn.Dense(self.num_classes + 1, name="sub_cls_embed")
        self.obj_cls_embed = nn.Dense(self.num_classes + 1, name="obj_cls_embed")
        self.rel_cls_embed = nn.Dense(self.num_relations + 1, name="rel_cls_embed")
        self.sub_mask_embed = MLP(C, C, 3, name="sub_mask_embed")
        self.obj_mask_embed = MLP(C, C, 3, name="obj_mask_embed")

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        mask_features, ms_feats = self.pixel_decoder(feats)
        pos = [
            sine_positional_encoding(f.shape[1], f.shape[2], self.embed_dims // 2)
            for f in ms_feats
        ]
        dec = self.transformer_decoder(ms_feats, mask_features, pos)
        q = dec["queries"]  # (B, Q, C)
        sub_m = self.sub_mask_embed(q)
        obj_m = self.obj_mask_embed(q)
        einsum = lambda e: jnp.einsum(
            "bqc,bhwc->bqhw", e, mask_features, preferred_element_type=jnp.float32
        )
        return {
            "sub": self.sub_cls_embed(q),
            "obj": self.obj_cls_embed(q),
            "rel": self.rel_cls_embed(q),
            "sub_seg": einsum(sub_m),
            "obj_seg": einsum(obj_m),
            # object-query panoptic path (shared decoder cls/mask heads)
            "cls": dec["cls"],
            "mask": dec["mask"],
            "queries": q,
        }


def mask_htri_match(
    s_cls, o_cls, r_cls, s_pts, o_pts,
    gt_s_pts, gt_o_pts, gt_s_lbl, gt_o_lbl, gt_r_lbl, rel_valid,
):
    """MaskHTriMatcher (one image): cls 2/2 + point BCE 5/5 + dice 5/5 + rel 2."""
    cost = (
        2.0 * classification_cost(s_cls, gt_s_lbl)
        + 5.0 * bce_mask_cost(s_pts, gt_s_pts)
        + 5.0 * dice_cost(s_pts, gt_s_pts)
        + 1.0 * classification_cost(o_cls, gt_o_lbl)
        + 5.0 * bce_mask_cost(o_pts, gt_o_pts)
        + 5.0 * dice_cost(o_pts, gt_o_pts)
        + 2.0 * classification_cost(r_cls, gt_r_lbl)
    )
    row2col, _ = hungarian(cost, col_mask=rel_valid)
    return row2col


def psgtr2_loss(
    outputs, batch, rng,
    num_classes: int = 133,
    num_points: int = 12544,
    bg_cls_weight: float = 0.02,
    rel_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
):
    """Triplet losses with point-sampled mask supervision (last layer)."""
    B, Q, _ = outputs["sub"].shape
    G = batch["gt_labels"].shape[1]
    Rm = batch["gt_rels"].shape[1]
    points = jax.random.uniform(rng, (B, num_points, 2))
    sg = jax.lax.stop_gradient

    def single(s_c, o_c, r_c, s_seg, o_seg, labels, masks, rels, rv, pts):
        sub_gt = jnp.clip(rels[:, 0], 0, G - 1)
        obj_gt = jnp.clip(rels[:, 1], 0, G - 1)
        gt_s_lbl = labels[sub_gt]
        gt_o_lbl = labels[obj_gt]
        gt_r = rels[:, 2]
        s_pts, gt_pts = sample_points_for_matching(s_seg, masks, pts)
        o_pts = sample_mask_points(o_seg, pts)
        gt_s_pts = gt_pts[sub_gt]
        gt_o_pts = gt_pts[obj_gt]
        relq2gt = mask_htri_match(
            sg(s_c), sg(o_c), sg(r_c), sg(s_pts), sg(o_pts),
            gt_s_pts, gt_o_pts, gt_s_lbl, gt_o_lbl, gt_r, rv,
        )
        return relq2gt, gt_s_lbl, gt_o_lbl, gt_r, s_pts, o_pts, gt_s_pts, gt_o_pts

    res = jax.vmap(single)(
        outputs["sub"], outputs["obj"], outputs["rel"],
        outputs["sub_seg"], outputs["obj_seg"],
        batch["gt_labels"], batch["gt_masks"], batch["gt_rels"],
        batch["rel_valid"], points,
    )
    relq2gt, gt_s_lbl, gt_o_lbl, gt_r, s_pts, o_pts, gt_s_pts, gt_o_pts = res
    pos = relq2gt >= 0
    safe = jnp.clip(relq2gt, 0, Rm - 1)
    take = jax.vmap(lambda a, i: a[i])
    w = pos.astype(jnp.float32)
    npos = jnp.maximum(w.sum(), 1.0)

    def ce(logits, labels, weights, avg, bg_pos):
        Cn = logits.shape[-1]
        cw = jnp.ones(Cn).at[bg_pos].set(bg_cls_weight)
        lbl = jnp.clip(labels, 0, Cn - 1)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        nll = -jnp.take_along_axis(logp, lbl[..., None], -1)[..., 0]
        return jnp.sum(nll * cw[lbl] * weights) / avg

    s_t = jnp.where(pos, take(gt_s_lbl, safe), num_classes)
    o_t = jnp.where(pos, take(gt_o_lbl, safe), num_classes)
    r_t = jnp.where(pos, take(gt_r, safe), 0)
    losses = {
        "s_loss_cls": ce(outputs["sub"], s_t, jnp.ones_like(w), npos, num_classes),
        "o_loss_cls": ce(outputs["obj"], o_t, jnp.ones_like(w), npos, num_classes),
        "r_loss_cls": rel_weight * ce(
            outputs["rel"], r_t, jnp.ones_like(w), jnp.maximum(w.size * 1.0, 1.0), 0
        ),
    }
    s_tgt = jnp.take_along_axis(gt_s_pts, safe[..., None], axis=1)
    o_tgt = jnp.take_along_axis(gt_o_pts, safe[..., None], axis=1)
    wq = w.reshape(-1)
    P = s_pts.shape[-1]
    losses["s_loss_mask"] = mask_weight * (
        jnp.sum(sigmoid_bce(s_pts, s_tgt).mean(-1).reshape(-1) * wq) / npos
    )
    losses["o_loss_mask"] = mask_weight * (
        jnp.sum(sigmoid_bce(o_pts, o_tgt).mean(-1).reshape(-1) * wq) / npos
    )
    losses["s_loss_dice"] = dice_weight * naive_dice_loss(
        s_pts.reshape(-1, P), s_tgt.reshape(-1, P), wq
    )
    losses["o_loss_dice"] = dice_weight * naive_dice_loss(
        o_pts.reshape(-1, P), o_tgt.reshape(-1, P), wq
    )
    losses["loss_total"] = sum(losses.values())
    return losses


def psgtr2_postprocess(outputs, image_index=None, num_things: int = 80):
    """Top-k (query x predicate) inference like the baseline head."""
    return baseline_postprocess(outputs, image_index, num_things)
