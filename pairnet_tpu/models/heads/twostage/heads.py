"""Two-stage relation heads: MOTIFS, IMP, GPS-Net over a shared base.

Behavioral counterparts of pairnet/models/relation_heads/{relation_head.py,
motif_head.py, imp_head.py, gps_head.py} (configs/motifs|imp|gpsnet/*):

* frontend: RoI features for the (GT or detected) boxes + union features
  for the sampled pairs (ref: relation_head.py:172-228),
* MOTIFS: LSTMContext -> post_emb -> head/tail split -> pair concat ->
  post_cat -> optional union gating -> rel classifier (+ FrequencyBias)
  (ref: motif_head.py:56-173),
* IMP: GRU message passing producing obj+rel dists directly
  (ref: imp_head.py:17-99),
* GPS-Net: DirectionAwareMessagePassing + fused relation inference
  (ref: gps_head.py:43-171),
* losses: CE on refined object scores + CE on relation labels
  (ref: relation_head.py:278-363, both weight 1.0),
* postprocess: triplet score = rel_prob x sub_score x obj_score, sorted
  descending (ref: approaches/relation_util.py:100-198 PostProcessor).

Batch layout (fixed shapes): boxes (B, N, 4), labels (B, N) 1-based with 0
bg, pairs (B, P, 2), pair labels (B, P) predicate 1-based with 0 bg.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.heads.twostage.contexts import (
    DMPContext,
    IMPContext,
    LSTMContext,
)
from pairnet_tpu.models.heads.twostage.core import (
    FrequencyBias,
    VisualSpatialExtractor,
    union_boxes,
)
from pairnet_tpu.models.losses import softmax_ce


class TwoStageRelationHead(nn.Module):
    """Shared frontend + mode handling. Subclasses implement ``predict``."""

    num_classes: int = 134  # with background (133 + 1)
    num_predicates: int = 57  # with background (56 + 1)
    mode: str = "predcls"
    hidden_dim: int = 512
    roi_dim: int = 1024
    context_pooling_dim: int = 4096
    embed_dim: int = 200
    use_bias: bool = False
    use_vision: bool = True
    in_channels: int = 256  # FPN channel count
    statistics: object = None  # pred_dist array for FrequencyBias

    def setup(self):
        self.bbox_roi_extractor = VisualSpatialExtractor(
            fc_out_channels=self.roi_dim, in_channels=self.in_channels,
            name="bbox_roi_extractor",
        )
        self.relation_roi_extractor = VisualSpatialExtractor(
            fc_out_channels=self.roi_dim, in_channels=self.in_channels,
            with_spatial=True, name="relation_roi_extractor",
        )
        if self.use_bias:
            self.freq_bias = FrequencyBias(
                self.num_classes - 1, self.num_predicates,
                statistics=self.statistics, name="freq_bias",
            )
        self.setup_head()

    def setup_head(self):  # pragma: no cover - overridden
        raise NotImplementedError

    def frontend(self, fpn_feats, batch):
        """RoI + union features, batched over images.

        fpn_feats: list of (B, H_l, W_l, C). batch needs det_boxes (B,N,4),
        pairs (B,P,2), image_shape (B,2).
        """
        def per_image(feats_i, boxes, pairs, hw):
            roi = self.bbox_roi_extractor(feats_i, boxes)
            u_boxes = union_boxes(boxes, pairs)
            union = self.relation_roi_extractor(
                feats_i, u_boxes, img_hw=hw,
                sub_rois=boxes[pairs[:, 0]], obj_rois=boxes[pairs[:, 1]],
            )
            return roi, union

        B = batch["det_boxes"].shape[0]
        rois, unions = [], []
        for b in range(B):  # python loop over static batch; jit unrolls
            feats_i = [f[b] for f in fpn_feats]
            r, u = per_image(
                feats_i, batch["det_boxes"][b], batch["pairs"][b],
                batch["image_shape"][b],
            )
            rois.append(r)
            unions.append(u)
        return jnp.stack(rois), jnp.stack(unions)

    def __call__(self, fpn_feats, batch, deterministic: bool = True):
        roi_feats, union_feats = self.frontend(fpn_feats, batch)
        return self.predict(roi_feats, union_feats, batch)


@HEADS.register()
class MotifHead(TwoStageRelationHead):
    def setup_head(self):
        self.context_layer = LSTMContext(
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
        labels = batch.get("det_labels")
        dists = batch.get("det_dists")
        obj_dists, obj_preds, edge_ctx = self.context_layer(
            roi_feats, batch["det_boxes"], batch["det_valid"],
            batch["image_shape"], labels=labels, dists=dists,
        )
        B, N, _ = roi_feats.shape
        edge_rep = self.post_emb(edge_ctx).reshape(B, N, 2, self.hidden_dim)
        head_rep = edge_rep[:, :, 0]
        tail_rep = edge_rep[:, :, 1]

        take = jax.vmap(lambda a, i: a[i])
        pairs = batch["pairs"]
        prod = jnp.concatenate(
            [take(head_rep, pairs[..., 0]), take(tail_rep, pairs[..., 1])], -1
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
        }


@HEADS.register()
class IMPHead(TwoStageRelationHead):
    num_iter: int = 2

    def setup_head(self):
        self.context_layer = IMPContext(
            self.num_classes, self.num_predicates,
            hidden_dim=self.hidden_dim, num_iter=self.num_iter,
            mode=self.mode, name="context_layer",
        )

    def predict(self, roi_feats, union_feats, batch):
        obj_dists, rel_scores = self.context_layer(
            roi_feats, union_feats, batch["pairs"],
            batch["det_valid"], batch["pair_valid"],
            labels=batch.get("det_labels"),
        )
        if self.mode == "predcls":
            obj_preds = batch["det_labels"]
        else:
            obj_preds = obj_dists[..., 1:].argmax(-1).astype(jnp.int32) + 1
        if self.use_bias:
            take = jax.vmap(lambda a, i: a[i])
            pairs = batch["pairs"]
            pair_pred = jnp.stack(
                [take(obj_preds, pairs[..., 0]), take(obj_preds, pairs[..., 1])],
                -1,
            )
            rel_scores = rel_scores + self.freq_bias(pair_pred)
        return {
            "refine_scores": obj_dists,
            "obj_preds": obj_preds,
            "rel_scores": rel_scores,
        }


@HEADS.register()
class GPSHead(TwoStageRelationHead):
    def setup_head(self):
        self.context_layer = DMPContext(
            self.num_classes, embed_dim=self.embed_dim, obj_dim=self.roi_dim,
            mode=self.mode, name="context_layer",
        )
        # fused relation inference (ref: gps_head.py:31-65 relation_infer):
        # t1/t2 project the sub/obj halves of the pair feature, t3 the union;
        # t4 = relu(t1+t2) - (t1-t2)^2; rel = out_rel(relu(t4+t3)-(t4-t3)^2)
        self.w_proj1 = nn.Dense(self.roi_dim, name="w_proj1")
        self.w_proj2 = nn.Dense(self.roi_dim, name="w_proj2")
        self.w_proj3 = nn.Dense(self.roi_dim, name="w_proj3")
        self.out_rel = nn.Dense(self.num_predicates, name="out_rel")
        if self.use_bias:
            self.wp = nn.Dense(self.num_predicates, name="wp")

    def predict(self, roi_feats, union_feats, batch):
        obj_dists, ctx = self.context_layer(
            roi_feats, union_feats, batch["pairs"], batch["det_boxes"],
            batch["det_valid"], batch["pair_valid"], batch["image_shape"],
            labels=batch.get("det_labels"), dists=batch.get("det_dists"),
        )
        if self.mode == "predcls":
            obj_preds = batch["det_labels"]
        else:
            # ref dmp.py:156-158: preds from softmaxed out_obj scores
            obj_preds = obj_dists[..., 1:].argmax(-1).astype(jnp.int32) + 1
        take = jax.vmap(lambda a, i: a[i])
        pairs = batch["pairs"]
        t1 = self.w_proj1(take(ctx, pairs[..., 0]))
        t2 = self.w_proj2(take(ctx, pairs[..., 1]))
        t3 = self.w_proj3(union_feats)
        t4 = nn.relu(t1 + t2) - (t1 - t2) * (t1 - t2)
        rel_scores = self.out_rel(nn.relu(t4 + t3) - (t4 - t3) * (t4 - t3))
        if self.use_bias:
            # ref gps_head.py:131-149: additive bias = sigmoid(wp(union)) *
            # log-softmaxed frequency row of the predicted pair
            pair_pred = jnp.stack(
                [take(obj_preds, pairs[..., 0]), take(obj_preds, pairs[..., 1])],
                -1,
            )
            log_freq = jax.nn.log_softmax(self.freq_bias(pair_pred), axis=-1)
            rel_scores = rel_scores + jax.nn.sigmoid(self.wp(union_feats)) * log_freq
        return {
            "refine_scores": obj_dists,
            "obj_preds": obj_preds,
            "rel_scores": rel_scores,
        }


def twostage_loss(outputs, batch, obj_loss_weight=1.0, rel_loss_weight=1.0):
    """CE on refined object scores + CE on relation labels
    (ref: relation_head.py:278-363)."""
    C = outputs["refine_scores"].shape[-1]
    R = outputs["rel_scores"].shape[-1]
    obj_w = batch["det_valid"].astype(jnp.float32).reshape(-1)
    loss_obj = softmax_ce(
        outputs["refine_scores"].reshape(-1, C),
        batch["det_labels"].reshape(-1),
        obj_w,
    )
    rel_w = batch["pair_valid"].astype(jnp.float32).reshape(-1)
    loss_rel = softmax_ce(
        outputs["rel_scores"].reshape(-1, R),
        batch["pair_labels"].reshape(-1),
        rel_w,
    )
    losses = {
        "loss_refine_obj": obj_loss_weight * loss_obj,
        "loss_rel": rel_loss_weight * loss_rel,
    }
    losses["loss_total"] = sum(losses.values())
    return losses


def twostage_postprocess(outputs, batch, image_index: int):
    """PostProcessor semantics (ref: relation_util.py:100-198): per-pair
    triplet score = max-rel-prob (bg zeroed) x sub obj scores, sorted
    descending. Returns numpy dict in the eval protocol."""
    import numpy as np

    b = image_index
    rel = jax.nn.softmax(
        jnp.asarray(outputs["rel_scores"][b], jnp.float32), -1
    )
    rel = rel.at[:, 0].set(0.0)
    refine = jax.nn.softmax(
        jnp.asarray(outputs["refine_scores"][b], jnp.float32), -1
    )
    pairs = np.asarray(batch["pairs"][b])
    pv = np.asarray(batch["pair_valid"][b])
    obj_scores = np.asarray(refine[:, 1:].max(-1))
    obj_labels = np.asarray(outputs["obj_preds"][b])

    rel_np = np.asarray(rel)
    rel_max = rel_np.max(-1)
    trip = rel_max * obj_scores[pairs[:, 0]] * obj_scores[pairs[:, 1]]
    trip = np.where(pv, trip, -1.0)
    order = np.argsort(-trip)
    order = order[pv[order]]
    return {
        "rel_pair_idxes": pairs[order],
        "rel_dists": rel_np[order],
        "labels": obj_labels,
        "obj_scores": obj_scores,
    }
