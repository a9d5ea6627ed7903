"""Panoptic FPN detector (inference path) for two-stage sgdet.

Counterpart of the mmdet PanopticFPN stack the reference wraps
(ref: pairnet/models/frameworks/sg_panoptic_fpn.py:57-142, 166-202 and
configs/motifs/panoptic_fpn_r50_fpn_1x_*.py): RPN -> RoI box head -> NMS ->
FCN mask head -> semantic head -> heuristic panoptic fusion -> per-segment
boxes/labels for the relation head.

The reference FREEZES the whole detector during relation training
(freeze_modules in every two-stage config) and runs it in eval mode even in
forward_train (ref: sg_panoptic_fpn.py:166-202), so this implementation is
inference-only: weights come from converted COCO checkpoints. Everything is
fixed-shape: top-k proposals, padded detections, masked NMS.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import MODELS
from pairnet_tpu.models.necks.fpn import FPN
from pairnet_tpu.models.necks.pixel_decoder import bilinear_resize
from pairnet_tpu.ops.boxes import cxcywh_to_xyxy
from pairnet_tpu.ops.nms import batched_nms, nms
from pairnet_tpu.ops.roi_align import multilevel_roi_align


def make_anchors(h: int, w: int, stride: int, scales=(8,), ratios=(0.5, 1.0, 2.0)):
    """(h*w*A, 4) xyxy anchors, mmdet AnchorGenerator semantics."""
    base = []
    for s in scales:
        for r in ratios:
            size = s * stride
            aw = size * (1.0 / r) ** 0.5
            ah = size * r**0.5
            base.append([-aw / 2, -ah / 2, aw / 2, ah / 2])
    base = jnp.asarray(base)  # (A, 4)
    ys = (jnp.arange(h) * stride).astype(jnp.float32)
    xs = (jnp.arange(w) * stride).astype(jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    shifts = jnp.stack([xx, yy, xx, yy], -1).reshape(-1, 1, 4)
    return (shifts + base[None]).reshape(-1, 4)


def delta2bbox(anchors, deltas, means=(0, 0, 0, 0), stds=(1, 1, 1, 1), max_hw=None):
    """mmdet DeltaXYWHBBoxCoder.decode."""
    deltas = deltas * jnp.asarray(stds) + jnp.asarray(means)
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = (anchors[:, 0] + anchors[:, 2]) / 2
    ay = (anchors[:, 1] + anchors[:, 3]) / 2
    dw = jnp.clip(deltas[:, 2], -4.0, 4.0)
    dh = jnp.clip(deltas[:, 3], -4.0, 4.0)
    cx = ax + deltas[:, 0] * aw
    cy = ay + deltas[:, 1] * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    if max_hw is not None:
        boxes = jnp.clip(
            boxes,
            jnp.zeros(4),
            jnp.asarray([max_hw[1], max_hw[0], max_hw[1], max_hw[0]], jnp.float32),
        )
    return boxes


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256

    @nn.compact
    def __call__(self, feats):
        outs = []
        conv = nn.Conv(
            self.channels, (3, 3), padding=[(1, 1), (1, 1)], name="rpn_conv"
        )
        cls = nn.Conv(self.num_anchors, (1, 1), name="rpn_cls")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="rpn_reg")
        for f in feats:
            x = nn.relu(conv(f))
            outs.append((cls(x), reg(x)))
        return outs


class BBoxHead(nn.Module):
    """mmdet Shared2FCBBoxHead (ref: pairnet/models/roi_heads/bbox_heads/
    sg_bbox_head.py keeps score dists)."""

    num_classes: int = 80
    fc_dim: int = 1024

    @nn.compact
    def __call__(self, roi_feats):  # (N, 7, 7, C)
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="shared_fc1")(x))
        x = nn.relu(nn.Dense(self.fc_dim, name="shared_fc2")(x))
        cls = nn.Dense(self.num_classes + 1, name="fc_cls")(x)
        reg = nn.Dense(self.num_classes * 4, name="fc_reg")(x)
        return cls, reg


class MaskHead(nn.Module):
    """FCN mask head: 4 convs + deconv -> per-class 28x28 masks."""

    num_classes: int = 80
    channels: int = 256

    @nn.compact
    def __call__(self, roi_feats):  # (N, 14, 14, C)
        x = roi_feats
        for i in range(4):
            x = nn.relu(
                nn.Conv(
                    self.channels, (3, 3), padding=[(1, 1), (1, 1)],
                    name=f"conv{i}",
                )(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.channels, (2, 2), strides=(2, 2), name="upsample"
            )(x)
        )
        return nn.Conv(self.num_classes, (1, 1), name="conv_logits")(x)


class SemanticHead(nn.Module):
    """Panoptic FPN semantic branch (mmdet PanopticFPNHead parity).

    Per FPN level i (0..3): ``max(1, i)`` ConvUpsample layers, each
    conv3x3(inner, no bias) -> GN(32) -> ReLU then (while upsamples remain,
    ``i`` of them) x2 bilinear; summed across levels and 1x1-projected to
    ``num_stuff + 1`` logits (channel 0 = all things lumped, 1..S = stuff).
    Ref: configs/_base_/models/panoptic_fpn_r50_fpn_psg.py:10-21 (mmdet
    PanopticFPNHead + ConvUpsample, inner_channels=128, GN32).
    """

    num_stuff: int = 53
    inner_channels: int = 128

    @nn.compact
    def __call__(self, feats):
        acc = None
        for i, f in enumerate(feats[:4]):
            x = f
            n_layers = max(1, i)
            n_up = i
            for j in range(n_layers):
                x = nn.Conv(
                    self.inner_channels, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name=f"up{i}_conv{j}",
                )(x)
                x = nn.GroupNorm(
                    num_groups=min(32, self.inner_channels),
                    epsilon=1e-5,  # torch GroupNorm default (flax is 1e-6)
                    name=f"up{i}_gn{j}",
                )(x)
                x = nn.relu(x)
                if n_up > 0:
                    n_up -= 1
                    x = bilinear_resize(x, (x.shape[1] * 2, x.shape[2] * 2))
            acc = x if acc is None else acc + x
        return nn.Conv(self.num_stuff + 1, (1, 1), name="conv_logits")(acc)


class PanopticSegments(NamedTuple):
    """Per-segment outputs of the heuristic panoptic fusion (things AND
    stuff), the two-stage relation head's detection contract."""

    boxes: jnp.ndarray  # (B, M, 4) input-pixel xyxy
    labels: jnp.ndarray  # (B, M) 1-based (1..T things, T+1..T+S stuff)
    dists: jnp.ndarray  # (B, M, C+1)
    valid: jnp.ndarray  # (B, M)
    masks: jnp.ndarray  # (B, M, h4, w4) bool at the mask stride


def heuristic_fusion_segments(
    dets: "Detections",
    det_masks: jnp.ndarray,  # (B, N, h4, w4) logits
    sem: jnp.ndarray,  # (B, h4, w4, S+1) logits (channel 0 = things)
    num_things: int,
    num_stuff: int,
    mask_stride: int = 4,
    overlap_thr: float = 0.5,
    stuff_area_limit: int = 4096,
) -> PanopticSegments:
    """mmdet HeuristicFusionHead -> per-segment boxes/labels, fixed shape.

    Counterpart of the reference two-stage sgdet detection source
    (ref: sg_panoptic_fpn.py:57-142 simple_test_sg_bboxes + mmdet
    HeuristicFusionHead; test_cfg panoptic mask_overlap=0.5,
    stuff_area_limit=4096 at configs/_base_/models/
    panoptic_fpn_r50_fpn_psg.py:25-34): detections paste score-descending
    onto a canvas (skipped when >overlap_thr of the mask is already
    claimed), then stuff classes claim unpainted argmax regions above the
    area limit. Output slots: N thing slots followed by ``num_stuff``
    stuff slots.
    """
    B, N, h4, w4 = det_masks.shape
    S = num_stuff
    binm = (jax.nn.sigmoid(det_masks) > 0.5) & dets.valid[:, :, None, None]

    def per_image(binm_i, scores, valid):
        order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
        claimed = jnp.zeros((h4, w4), bool)
        kept_masks = jnp.zeros((N, h4, w4), bool)
        kept = jnp.zeros((N,), bool)

        def body(k, st):
            claimed, kept_masks, kept = st
            i = order[k]
            m = binm_i[i]
            area = m.sum()
            fresh = (m & ~claimed)
            fresh_area = fresh.sum()
            keep = (area > 0) & (
                (area - fresh_area).astype(jnp.float32)
                <= overlap_thr * area.astype(jnp.float32)
            )
            claimed = jnp.where(keep, claimed | fresh, claimed)
            kept_masks = kept_masks.at[i].set(jnp.where(keep, fresh, False))
            kept = kept.at[i].set(keep)
            return claimed, kept_masks, kept

        claimed, kept_masks, kept = jax.lax.fori_loop(
            0, N, body, (claimed, kept_masks, kept)
        )
        return claimed, kept_masks, kept

    claimed, thing_masks, thing_kept = jax.vmap(per_image)(
        binm, dets.scores, dets.valid
    )

    # stuff: per-pixel argmax over the semantic logits; channel 0 = things
    seg_cls = jnp.argmax(sem.astype(jnp.float32), -1)  # (B, h4, w4)
    sids = jnp.arange(1, S + 1)
    stuff_masks = (
        (seg_cls[:, None] == sids[None, :, None, None])
        & ~claimed[:, None]
    )  # (B, S, h4, w4)
    areas = stuff_masks.sum((-2, -1))
    min_area = stuff_area_limit / (mask_stride * mask_stride)
    stuff_kept = areas >= min_area

    def boxes_from_masks(m):  # (M, h4, w4) bool -> (M, 4) pixel xyxy
        ys = jnp.any(m, axis=2)
        xs = jnp.any(m, axis=1)
        yi = jnp.arange(h4)
        xi = jnp.arange(w4)
        y0 = jnp.min(jnp.where(ys, yi[None], h4), axis=1)
        y1 = jnp.max(jnp.where(ys, yi[None] + 1, 0), axis=1)
        x0 = jnp.min(jnp.where(xs, xi[None], w4), axis=1)
        x1 = jnp.max(jnp.where(xs, xi[None] + 1, 0), axis=1)
        return jnp.stack([x0, y0, x1, y1], -1).astype(jnp.float32) * mask_stride

    masks = jnp.concatenate([thing_masks, stuff_masks], axis=1)
    valid = jnp.concatenate([thing_kept & dets.valid, stuff_kept], axis=1)
    boxes = jax.vmap(boxes_from_masks)(masks)
    C1 = dets.dists.shape[-1]
    stuff_labels = jnp.broadcast_to(num_things + sids[None], (B, S))
    labels = jnp.concatenate(
        [dets.labels, stuff_labels.astype(dets.labels.dtype)], axis=1
    )
    # stuff score = 1.0 one-hot dist (ref gives stuff unit confidence)
    stuff_dists = jax.nn.one_hot(
        jnp.clip(stuff_labels - 1, 0, C1 - 1), C1
    )
    dists = jnp.concatenate([dets.dists, stuff_dists], axis=1)
    labels = jnp.where(valid, labels, 0)
    return PanopticSegments(
        boxes=boxes, labels=labels, dists=dists, valid=valid, masks=masks
    )


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, N, 4)
    labels: jnp.ndarray  # (B, N) 1-based (0 invalid)
    scores: jnp.ndarray  # (B, N)
    dists: jnp.ndarray  # (B, N, C+1)
    valid: jnp.ndarray  # (B, N)


@MODELS.register()
class PanopticFPN(nn.Module):
    backbone: nn.Module
    num_things: int = 80
    num_stuff: int = 53
    num_proposals: int = 256
    max_dets: int = 64
    score_thr: float = 0.3
    nms_iou: float = 0.5
    strides: tuple = (4, 8, 16, 32, 64)

    def setup(self):
        self.neck = FPN(out_channels=256, num_outs=5, name="neck")
        self.rpn_head = RPNHead(name="rpn_head")
        self.bbox_head = BBoxHead(self.num_things, name="bbox_head")
        self.mask_head = MaskHead(self.num_things, name="mask_head")
        self.semantic_head = SemanticHead(self.num_stuff, name="semantic_head")

    def __call__(self, images, image_shape, with_masks: bool = False):
        """-> (Detections, semantic logits (B, H/4, W/4, S+1)[, det mask
        logits (B, N, H/4, W/4) when with_masks])."""
        feats = self.backbone(images)
        fpn = self.neck(feats)
        rpn_outs = self.rpn_head(fpn)

        B = images.shape[0]
        all_scores, all_boxes = [], []
        for lvl, ((cls, reg), stride) in enumerate(zip(rpn_outs, self.strides)):
            h, w = cls.shape[1], cls.shape[2]
            anchors = make_anchors(h, w, stride)
            scores = cls.reshape(B, -1)
            deltas = reg.reshape(B, -1, 4)
            # per-level pre-NMS top-k keeps shapes bounded
            k = min(1000, scores.shape[1])
            top_s, top_i = jax.lax.top_k(scores, k)
            take = jax.vmap(lambda a, i: a[i])
            boxes = jax.vmap(
                lambda d, a: delta2bbox(a, d)
            )(take(deltas, top_i), jnp.broadcast_to(anchors[None], (B, *anchors.shape))[
                jnp.arange(B)[:, None], top_i
            ])
            all_scores.append(top_s)
            all_boxes.append(boxes)
        scores = jnp.concatenate(all_scores, 1)
        boxes = jnp.concatenate(all_boxes, 1)

        def per_image(s, b, hw):
            keep = nms(b, jax.nn.sigmoid(s), 0.7)
            ranked = jnp.argsort(-jnp.where(keep, s, -jnp.inf))[: self.num_proposals]
            return b[ranked], keep[ranked]

        props, prop_valid = jax.vmap(per_image)(
            scores, boxes, image_shape
        )  # (B, P, 4)

        # RoI classification (strides 4-32 levels)
        def roi_stage(fpn_b, rois):
            return multilevel_roi_align(
                [fpn_b[i] for i in range(4)], self.strides[:4], rois, 7
            )

        cls_list, box_list = [], []
        for b in range(B):
            roi_feats = roi_stage([f[b] for f in fpn], props[b])
            cls, reg = self.bbox_head(roi_feats)
            cls_list.append(cls)
            box_list.append(reg)
        cls = jnp.stack(cls_list)  # (B, P, C+1)
        reg = jnp.stack(box_list)  # (B, P, C*4)

        def decode_dets(cls_b, reg_b, props_b, pvalid, hw):
            probs = jax.nn.softmax(cls_b.astype(jnp.float32), -1)
            fg = probs[:, :-1]  # (P, C)
            label = fg.argmax(-1)
            score = fg.max(-1)
            deltas = reg_b.reshape(-1, self.num_things, 4)[
                jnp.arange(reg_b.shape[0]), label
            ]
            det_boxes = delta2bbox(
                props_b, deltas, stds=(0.1, 0.1, 0.2, 0.2), max_hw=hw
            )
            ok = pvalid & (score > self.score_thr)
            keep = batched_nms(det_boxes, score, label, self.nms_iou, ok)
            ranked = jnp.argsort(-jnp.where(keep, score, -jnp.inf))[: self.max_dets]
            kmask = keep[ranked]
            return (
                det_boxes[ranked],
                jnp.where(kmask, label[ranked] + 1, 0),
                jnp.where(kmask, score[ranked], 0.0),
                probs[ranked],
                kmask,
            )

        dets = jax.vmap(decode_dets)(cls, reg, props, prop_valid, image_shape)
        dets = Detections(*dets)
        sem = self.semantic_head(fpn)
        if not with_masks:
            return dets, sem

        # FCN mask head on the final detections, pasted onto the stride-4
        # canvas (ref: sg_panoptic_fpn.py sgdet path runs the mmdet mask
        # head + paste; here the paste is a per-det bilinear grid sample)
        from pairnet_tpu.ops.sampling import point_sample

        s = 4
        h4, w4 = images.shape[1] // s, images.shape[2] // s
        mask_list = []
        for b in range(B):
            roi_feats = multilevel_roi_align(
                [f[b] for f in fpn[:4]], self.strides[:4], dets.boxes[b], 14
            )
            logits = self.mask_head(roi_feats)  # (N, 28, 28, C_things)
            lab = jnp.clip(dets.labels[b] - 1, 0, self.num_things - 1)
            m = jnp.take_along_axis(
                logits, lab[:, None, None, None], axis=-1
            )[..., 0]  # (N, 28, 28)

            ys = (jnp.arange(h4, dtype=jnp.float32) + 0.5) * s
            xs = (jnp.arange(w4, dtype=jnp.float32) + 0.5) * s
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

            def paste(mask28, box):
                x1, y1, x2, y2 = box
                bw = jnp.maximum(x2 - x1, 1.0)
                bh = jnp.maximum(y2 - y1, 1.0)
                pts = jnp.stack([(xx - x1) / bw, (yy - y1) / bh], -1)
                out = point_sample(mask28[..., None], pts)[..., 0]
                inside = (
                    (pts[..., 0] >= 0) & (pts[..., 0] < 1)
                    & (pts[..., 1] >= 0) & (pts[..., 1] < 1)
                )
                return jnp.where(inside, out, -1e4)

            mask_list.append(jax.vmap(paste)(m, dets.boxes[b]))
        det_masks = jnp.stack(mask_list)  # (B, N, h4, w4) logits
        return dets, sem, det_masks
