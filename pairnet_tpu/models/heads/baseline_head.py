"""PSGFormer+ baseline head ("CrossHeadBaseline").

Behavioral counterpart of pairnet/models/relation_heads/baseline.py
(config configs/mask2former/baseline_r50_psg.py): the same Mask2Former
segmenter, but instead of the PPN the relation queries attend directly over
the encoder memories (round-robin over scales), and subjects/objects are
recovered by PROTOTYPE MATCHING — cosine scores between normalized relation
queries and normalized sub/obj projections of the object queries
(ref: baseline.py:370-399). Unlike Pair-Net, this head trains the full
per-layer panoptic cls/mask/dice losses (ref: baseline.py:446-530).

Loss pieces (ref config lines 336-378):
  rel CE over 57 (bg col 0) with class_weight [0.02] + [1.0]*56, weight 2.0,
  sub/obj id: MultilabelCrossEntropy over matched-query columns, weight 2.0,
  per-layer cls (bg 0.1) / point-BCE mask / naive dice, weights 2/5/5,
  OldIdMatcher costs 1/1/1 on (sub-id, obj-id, predicate).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.decoders.mask2former_decoder import (
    DecoderLayer,
    Mask2FormerDecoder,
)
from pairnet_tpu.models.layers import MLP, sine_positional_encoding
from pairnet_tpu.models.losses import (
    naive_dice_loss,
    sigmoid_bce,
    softmax_ce,
)
from pairnet_tpu.models.matchers import (
    classification_cost,
    mask_hungarian_assign,
    sample_points_for_matching,
)
from pairnet_tpu.models.necks.pixel_decoder import MSDeformAttnPixelDecoder
from pairnet_tpu.ops.hungarian import hungarian
from pairnet_tpu.ops.sampling import sample_mask_points


@HEADS.register()
class BaselineHead(nn.Module):
    num_classes: int = 133
    num_relations: int = 56
    num_obj_query: int = 100
    num_rel_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_decoder_layers: int = 9
    num_relation_layers: int = 6
    num_feat_levels: int = 3
    pixel_decoder_layers: int = 6
    # MyPSGFormerHead (ref: pairnet/models/relation_heads/psgformer_head.py —
    # PSGFormer ported onto the Mask2Former pixel decoder) uses temperature-
    # scaled prototype scores like the original PSGFormer; the PSGFormer+
    # baseline uses temp = 1.0
    temp: float = 1.0

    def setup(self):
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=self.embed_dims,
            out_channels=self.embed_dims,
            num_encoder_levels=self.num_feat_levels,
            num_encoder_layers=self.pixel_decoder_layers,
            num_heads=self.num_heads,
            name="pixel_decoder",
        )
        self.transformer_decoder = Mask2FormerDecoder(
            num_classes=self.num_classes,
            num_queries=self.num_obj_query,
            embed_dims=self.embed_dims,
            num_heads=self.num_heads,
            num_layers=self.num_decoder_layers,
            num_feat_levels=self.num_feat_levels,
            out_channels=self.embed_dims,
            return_intermediate=True,
            name="transformer_decoder",
        )
        K, C = self.num_rel_query, self.embed_dims
        init = nn.initializers.normal(1.0)
        self.rel_query_feat = self.param("rel_query_feat", init, (K, C))
        self.rel_query_embed = self.param("rel_query_embed", init, (K, C))
        self.sub_query_update = MLP(C, C, 3, name="sub_query_update")
        self.obj_query_update = MLP(C, C, 3, name="obj_query_update")
        # rel classifier has a background column (CE, not Seesaw)
        self.rel_cls_embed = nn.Dense(self.num_relations + 1, name="rel_cls_embed")
        self.relation_layers = [
            DecoderLayer(C, self.num_heads, 2048, name=f"relation_layer_{i}")
            for i in range(self.num_relation_layers)
        ]

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        mask_features, ms_feats = self.pixel_decoder(feats)
        pos_encodings = [
            sine_positional_encoding(f.shape[1], f.shape[2], self.embed_dims // 2)
            for f in ms_feats
        ]
        dec = self.transformer_decoder(ms_feats, mask_features, pos_encodings)
        queries = dec["queries"]  # (B, Q, C) final layer
        B, Q, C = queries.shape
        K = self.num_rel_query

        memories = [
            f.reshape(B, -1, C) + self.transformer_decoder.level_embed[lvl]
            for lvl, f in enumerate(ms_feats)
        ]
        mem_pos = [
            pos_encodings[lvl].reshape(1, -1, C)
            for lvl in range(self.num_feat_levels)
        ]

        rel_query = jnp.broadcast_to(self.rel_query_feat[None], (B, K, C))
        for i, layer in enumerate(self.relation_layers):
            lvl = i % self.num_feat_levels
            rel_query = layer(
                rel_query,
                self.rel_query_embed[None],
                memories[lvl],
                mem_pos[lvl],
                None,
                deterministic=deterministic,
            )

        def l2n(x):
            return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

        sub_proto = l2n(self.sub_query_update(queries))  # (B, Q, C)
        obj_proto = l2n(self.obj_query_update(queries))
        rel_n = l2n(rel_query)
        subject_scores = jnp.einsum("bkc,bqc->bkq", rel_n, sub_proto) / self.temp
        object_scores = jnp.einsum("bkc,bqc->bkq", rel_n, obj_proto) / self.temp
        sub_ids = subject_scores.argmax(-1)  # (B, K)
        obj_ids = object_scores.argmax(-1)

        rel_preds = self.rel_cls_embed(rel_query)  # (B, K, R+1)

        take = jax.vmap(lambda arr, idx: jnp.take(arr, idx, axis=0))
        cls_last = dec["cls"]
        mask_last = dec["mask"]
        out = {
            "cls": cls_last,
            "mask": mask_last,
            "cls_layers": [c for c, _ in dec["intermediates"]],
            "mask_layers": [m for _, m in dec["intermediates"]],
            "rel": rel_preds,
            "subject_scores": subject_scores,
            "object_scores": object_scores,
            "sub": take(cls_last, sub_ids),
            "obj": take(cls_last, obj_ids),
            "sub_seg": take(mask_last, sub_ids),
            "obj_seg": take(mask_last, obj_ids),
            "sub_pos": sub_ids,
            "obj_pos": obj_ids,
            "queries": queries,
        }
        return out


def _baseline_targets_single(
    cls_pred, mask_pred, subject_scores, object_scores, rel_scores,
    gt_labels, gt_masks, gt_valid, gt_rels, rel_valid, points,
):
    """Per-image, per-layer mask Hungarian + OldIdMatcher triplet match."""
    Q = cls_pred.shape[0]
    G = gt_labels.shape[0]
    Rm = gt_rels.shape[0]

    mask_pts, gt_pts = sample_points_for_matching(mask_pred, gt_masks, points)
    assign = mask_hungarian_assign(cls_pred, mask_pts, gt_labels, gt_pts, gt_valid)
    gt2query = assign.gt2query  # (G,)
    query_matched = assign.query2gt >= 0  # (Q,)

    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    rel_ok = rel_valid & (gt2query[sub_gt] >= 0) & (gt2query[obj_gt] >= 0)
    gt_sub_q = jnp.where(rel_ok, gt2query[sub_gt], 0)  # query ids
    gt_obj_q = jnp.where(rel_ok, gt2query[obj_gt], 0)
    gt_rel_1based = gt_rels[:, 2]

    # OldIdMatcher: costs on (subject_scores vs sub query id, object_scores
    # vs obj query id, rel scores vs 1-based predicate), all weight 1.0
    cost = (
        classification_cost(subject_scores, gt_sub_q)
        + classification_cost(object_scores, gt_obj_q)
        + classification_cost(rel_scores, gt_rel_1based)
    )
    relq2gt, _ = hungarian(cost, col_mask=rel_ok)
    pos = relq2gt >= 0
    safe = jnp.clip(relq2gt, 0, Rm - 1)

    r_labels = jnp.where(pos, gt_rel_1based[safe], 0)  # bg = 0
    sub_target_q = jnp.where(pos, gt_sub_q[safe], -1)
    obj_target_q = jnp.where(pos, gt_obj_q[safe], -1)

    return (
        assign.query2gt, query_matched, mask_pts, gt_pts,
        r_labels, pos, sub_target_q, obj_target_q,
    )


def masked_multilabel_ce(scores, target_q, row_mask, col_mask):
    """MultilabelCrossEntropy over a column subset
    (ref: seg_losses.py:47-57 + the filtering at baseline.py:884-900).

    scores (K, Q); softmax restricted to columns where col_mask; target is
    the single column target_q (one-hot); mean over rows where row_mask.
    """
    neg = jnp.asarray(-1e9, scores.dtype)
    masked = jnp.where(col_mask[None, :], scores, neg)
    logp = jax.nn.log_softmax(masked.astype(jnp.float32), axis=-1)
    t = jnp.clip(target_q, 0, scores.shape[-1] - 1)
    nll = -jnp.take_along_axis(logp, t[:, None], axis=-1)[:, 0]
    w = row_mask.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(w.sum(), 1.0)


def baseline_loss(
    outputs,
    batch,
    rng,
    num_points: int = 12544,
    cls_loss_weight: float = 2.0,
    mask_loss_weight: float = 5.0,
    dice_loss_weight: float = 5.0,
    rel_loss_weight: float = 2.0,
    id_loss_weight: float = 2.0,
    bg_class_weight: float = 0.1,
    rel_bg_weight: float = 0.02,
    use_seesaw: bool = False,
    cum_samples=None,
):
    """Full PSGFormer+ loss dict (per-layer seg + last-layer relation).

    ``use_seesaw=True`` gives the CrossHead4 variant (ref: baseline_seesaw.py
    — baseline + Seesaw relation loss over num_relations+1 classes); pass and
    carry ``cum_samples`` ((R+1,) running counts) in the train state. Returns
    (losses, new_cum_samples) in that case.
    """
    B, K, R1 = outputs["rel"].shape
    Cp1 = outputs["cls"].shape[-1]
    G = batch["gt_labels"].shape[1]
    points = jax.random.uniform(rng, (B, num_points, 2))
    sg = jax.lax.stop_gradient

    losses = {}
    cls_layers = outputs["cls_layers"] + [outputs["cls"]]
    mask_layers = outputs["mask_layers"] + [outputs["mask"]]
    # the decoder returns intermediates INCLUDING the final layer; dedup
    if len(outputs["cls_layers"]) == len(mask_layers) - 1 + 1:
        cls_layers = outputs["cls_layers"]
        mask_layers = outputs["mask_layers"]

    take = jax.vmap(lambda a, i: a[i])
    n_layers = len(cls_layers)
    class_weight = jnp.concatenate(
        [jnp.ones(Cp1 - 1), jnp.array([bg_class_weight])]
    )
    rel_class_weight = jnp.concatenate(
        [jnp.array([rel_bg_weight]), jnp.ones(R1 - 1)]
    )

    for li in range(n_layers):
        cls_pred = cls_layers[li]
        mask_pred = mask_layers[li]
        res = jax.vmap(_baseline_targets_single)(
            sg(cls_pred), sg(mask_pred),
            sg(outputs["subject_scores"]), sg(outputs["object_scores"]),
            sg(outputs["rel"]),
            batch["gt_labels"], batch["gt_masks"], batch["gt_valid"],
            batch["gt_rels"], batch["rel_valid"], points,
        )
        (q2g, q_matched, _, gt_pts, r_labels, r_pos, sub_tq, obj_tq) = res

        safe = jnp.clip(q2g, 0, G - 1)
        cls_t = jnp.where(q_matched, take(batch["gt_labels"], safe), Cp1 - 1)
        loss_cls = softmax_ce(
            cls_pred.reshape(-1, Cp1),
            cls_t.reshape(-1),
            jnp.ones((B * cls_t.shape[1],), jnp.float32),
            class_weight=class_weight,
        )
        pred_pts = jax.vmap(sample_mask_points)(mask_pred, points)
        gt_for_q = jnp.take_along_axis(gt_pts, safe[..., None], axis=1)
        wq = q_matched.astype(jnp.float32).reshape(-1)
        loss_mask = jnp.sum(
            sigmoid_bce(pred_pts, gt_for_q).mean(-1).reshape(-1) * wq
        ) / jnp.maximum(wq.sum(), 1.0)
        loss_dice = naive_dice_loss(
            pred_pts.reshape(B * pred_pts.shape[1], -1),
            gt_for_q.reshape(B * gt_for_q.shape[1], -1),
            wq,
        )
        tag = "" if li == n_layers - 1 else f"d{li}."
        losses[f"{tag}loss_cls"] = cls_loss_weight * loss_cls
        losses[f"{tag}loss_mask"] = mask_loss_weight * loss_mask
        losses[f"{tag}loss_dice"] = dice_loss_weight * loss_dice

        if li == n_layers - 1:
            if use_seesaw:
                # CrossHead4: Seesaw relation CE with running counts
                from pairnet_tpu.models.losses import seesaw_ce

                loss_r, new_cum = seesaw_ce(
                    outputs["rel"].reshape(-1, R1),
                    r_labels.reshape(-1),
                    jnp.ones((B * K,), jnp.float32),
                    cum_samples,
                )
                losses["r_loss_cls"] = rel_loss_weight * loss_r
            else:
                # relation CE with bg column 0 over all K queries
                cw = rel_class_weight[jnp.clip(r_labels.reshape(-1), 0, R1 - 1)]
                logp = jax.nn.log_softmax(
                    outputs["rel"].reshape(-1, R1).astype(jnp.float32), -1
                )
                nll = -jnp.take_along_axis(
                    logp, r_labels.reshape(-1, 1), axis=-1
                )[:, 0]
                losses["r_loss_cls"] = rel_loss_weight * (
                    jnp.sum(nll * cw) / jnp.maximum(cw.sum(), 1e-7)
                )
            lsub = jax.vmap(masked_multilabel_ce)(
                outputs["subject_scores"], sub_tq, r_pos, q_matched
            )
            lobj = jax.vmap(masked_multilabel_ce)(
                outputs["object_scores"], obj_tq, r_pos, q_matched
            )
            losses["loss_subject_match"] = id_loss_weight * lsub.mean()
            losses["loss_object_match"] = id_loss_weight * lobj.mean()

    losses["loss_total"] = sum(losses.values())
    if use_seesaw:
        return losses, new_cum
    return losses


def baseline_postprocess(outputs, image_index: int | None = None, num_things: int = 80):
    """Top-k over (rel query x predicate) probs (ref: baseline.py:1035-1046),
    returns the same TripletPrediction protocol as the Pair-Net head."""
    from pairnet_tpu.models.heads.pairnet_inference import (
        TripletPrediction,
        panoptic_fusion,
    )

    b = image_index
    get = (lambda x: x[b]) if b is not None else (lambda x: x)
    r_cls = get(outputs["rel"])  # (K, R+1)
    K, R1 = r_cls.shape
    R = R1 - 1
    r_lgs = jax.nn.softmax(r_cls.astype(jnp.float32), -1)
    flat = r_lgs[:, 1:].reshape(-1)
    _, idx = jax.lax.top_k(flat, K)
    r_labels = idx % R + 1
    triplet_index = idx // R

    s_cls = get(outputs["sub"])[triplet_index]
    o_cls = get(outputs["obj"])[triplet_index]
    s_seg = get(outputs["sub_seg"])[triplet_index]
    o_seg = get(outputs["obj_seg"])[triplet_index]
    s_labels = (
        jax.nn.softmax(s_cls.astype(jnp.float32), -1)[:, :-1].argmax(-1) + 1
    ).astype(jnp.int32)
    o_labels = (
        jax.nn.softmax(o_cls.astype(jnp.float32), -1)[:, :-1].argmax(-1) + 1
    ).astype(jnp.int32)
    r_dists = r_lgs[triplet_index]

    fusion = panoptic_fusion(get(outputs["cls"]), get(outputs["mask"]), num_things)
    masks = jnp.concatenate(
        [jax.nn.sigmoid(s_seg) > 0.5, jax.nn.sigmoid(o_seg) > 0.5], axis=0
    )
    return TripletPrediction(
        labels=jnp.concatenate([s_labels, o_labels]),
        rel_pairs=jnp.stack(
            [jnp.arange(K, dtype=jnp.int32), jnp.arange(K, 2 * K, dtype=jnp.int32)],
            axis=-1,
        ),
        masks=masks,
        pan_seg=fusion.pan_seg,
        r_dists=r_dists,
        r_labels=r_labels.astype(jnp.int32),
        r_scores=flat[idx],
    )


@HEADS.register()
class MyPSGFormerHead(BaselineHead):
    """PSGFormer on the Mask2Former pixel decoder (ref: psgformer_head.py):
    the PSGFormer+ architecture with the original temperature-scaled
    prototype matching."""

    temp: float = 0.1
