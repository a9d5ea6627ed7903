"""Two-stage relation head substrate: RoI/union extraction, frequency bias,
pair sampling, box encodings.

Behavioral counterparts of:
* VisualSpatialExtractor (ref: pairnet/models/roi_extractors/
  visual_spatial.py:25-567): multi-level RoIAlign 7x7 -> flatten -> 2-layer
  FC head (1024); union features add a 2-channel rasterized sub/obj
  rectangle mask (27x27) through conv(7x7,s2)->maxpool->conv(3x3)
  (ref: visual_spatial.py:136-160, 435-485),
* FrequencyBias (ref: approaches/motif.py:22-67): (sub,obj) -> predicate
  log-frequency table from dataset statistics,
* RelationSampler (ref: approaches/sampling.py:21-466): here pair sampling
  runs on the HOST in the pipeline for fixed shapes — gtbox_relsample
  semantics (positives from the GT relation map, sampled background pairs,
  num_rel_per_image cap with pos_fraction) and all-pairs test sampling,
* encode_box_info (ref: approaches/motif_util.py:136-166).

Everything below the sampler is batched fixed-shape device code.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.ops.roi_align import multilevel_roi_align


def encode_box_info(boxes: jnp.ndarray, img_hw: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) xyxy + (2,) (h, w) -> (N, 9) normalized box statistics."""
    hei = img_hw[0].astype(jnp.float32)
    wid = img_hw[1].astype(jnp.float32)
    w = boxes[:, 2] - boxes[:, 0] + 1.0
    h = boxes[:, 3] - boxes[:, 1] + 1.0
    x = boxes[:, 0] + 0.5 * w
    y = boxes[:, 1] + 0.5 * h
    return jnp.stack(
        [
            w / wid, h / hei, x / wid, y / hei,
            boxes[:, 0] / wid, boxes[:, 1] / hei,
            boxes[:, 2] / wid, boxes[:, 3] / hei,
            w * h / (wid * hei),
        ],
        axis=-1,
    )


class FrequencyBias(nn.Module):
    """(sub_label, obj_label) -> predicate log-frequency bias.

    ``statistics`` is ``pred_dist`` from PSGDataset.get_statistics()
    ((C, C, R+1) log-probabilities); labels are 1-based with 0 background,
    matching the reference's index_with_labels (approaches/motif.py:42-50).
    """

    num_classes: int  # foreground classes C (labels are 1..C)
    num_predicates: int  # R + 1 (with background col 0)
    statistics: np.ndarray | None = None

    @nn.compact
    def __call__(self, pair_labels: jnp.ndarray) -> jnp.ndarray:
        """pair_labels (..., 2) 1-based -> (..., R+1)."""
        C = self.num_classes

        def init(key, shape, dtype=jnp.float32):
            if self.statistics is not None:
                return jnp.asarray(
                    np.asarray(self.statistics).reshape(C * C, -1), dtype
                )
            return jnp.zeros(shape, dtype)

        table = self.param("pred_baseline", init, (C * C, self.num_predicates))
        idx = (jnp.clip(pair_labels[..., 0] - 1, 0, C - 1) * C
               + jnp.clip(pair_labels[..., 1] - 1, 0, C - 1))
        return table[idx]


class SpatialConv(nn.Module):
    """2-channel rasterized rect masks -> roi_out_channels map (27x27 -> 7x7)."""

    in_channels: int = 256

    @nn.compact
    def __call__(self, rects):  # (P, 27, 27, 2)
        x = nn.Conv(
            self.in_channels // 2, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], name="conv1",
        )(rects)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=True, name="bn1")(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(
            self.in_channels, (3, 3), padding=[(1, 1), (1, 1)], name="conv2"
        )(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=True, name="bn2")(x)


class VisualSpatialExtractor(nn.Module):
    """RoIAlign features for boxes or union boxes (+ optional spatial rects)."""

    fc_out_channels: int = 1024
    in_channels: int = 256
    with_spatial: bool = False
    roi_size: int = 7
    strides: tuple[int, ...] = (4, 8, 16, 32)
    spatial_size: int = 27  # roi_size * 4 - 1

    @nn.compact
    def __call__(self, feats, rois, img_hw=None, sub_rois=None, obj_rois=None):
        """feats: FPN levels [(B?, H, W, C)...] for ONE image (no batch dim);
        rois (P, 4) xyxy pixels. Returns (P, fc_out)."""
        roi_feats = multilevel_roi_align(
            list(feats), self.strides, rois, self.roi_size
        )  # (P, 7, 7, C)

        if self.with_spatial:
            assert sub_rois is not None and obj_rois is not None
            S = self.spatial_size
            scale = jnp.stack(
                [img_hw[1], img_hw[0], img_hw[1], img_hw[0]]
            ).astype(jnp.float32)
            sr = sub_rois / scale * S
            orr = obj_rois / scale * S
            xs = jnp.arange(S, dtype=jnp.float32)[None, None, :]
            ys = jnp.arange(S, dtype=jnp.float32)[None, :, None]

            def rect(b):
                return (
                    (xs >= jnp.floor(b[:, 0])[:, None, None])
                    & (xs <= jnp.ceil(b[:, 2])[:, None, None])
                    & (ys >= jnp.floor(b[:, 1])[:, None, None])
                    & (ys <= jnp.ceil(b[:, 3])[:, None, None])
                ).astype(jnp.float32)

            rects = jnp.stack([rect(sr), rect(orr)], axis=-1)  # (P, S, S, 2)
            roi_feats = roi_feats + SpatialConv(self.in_channels, name="spatial")(
                rects
            )

        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_out_channels, name="fc1")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, name="fc2")(x))
        return x


def union_boxes(boxes: jnp.ndarray, pairs: jnp.ndarray) -> jnp.ndarray:
    """(N, 4), (P, 2) -> (P, 4) enclosing boxes."""
    s = boxes[pairs[:, 0]]
    o = boxes[pairs[:, 1]]
    return jnp.stack(
        [
            jnp.minimum(s[:, 0], o[:, 0]),
            jnp.minimum(s[:, 1], o[:, 1]),
            jnp.maximum(s[:, 2], o[:, 2]),
            jnp.maximum(s[:, 3], o[:, 3]),
        ],
        axis=-1,
    )


# ---------------- host-side pair sampling (fixed shapes) -------------------


def sample_train_pairs(
    relation_map: np.ndarray,  # (n, n) predicate (1-based) or 0
    n_valid: int,
    max_pairs: int,
    pos_fraction: float = 0.25,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """gtbox_relsample semantics (ref: sampling.py:69-186): all GT-related
    pairs are positives (capped at max_pairs * pos_fraction), background
    pairs sampled from unrelated i != j pairs. Returns fixed-shape
    (pairs (max_pairs, 2), labels (max_pairs,), valid (max_pairs,))."""
    rng = rng or np.random.default_rng()
    num_pos_max = int(max_pairs * pos_fraction)
    ps, po = np.nonzero(relation_map[:n_valid, :n_valid])
    pos_labels = relation_map[ps, po]
    if len(ps) > num_pos_max:
        sel = rng.permutation(len(ps))[:num_pos_max]
        ps, po, pos_labels = ps[sel], po[sel], pos_labels[sel]

    ii, jj = np.meshgrid(np.arange(n_valid), np.arange(n_valid), indexing="ij")
    neg_mask = (ii != jj) & (relation_map[:n_valid, :n_valid] == 0)
    ns, no = np.nonzero(neg_mask)
    n_neg = min(len(ns), max_pairs - len(ps))
    if len(ns) > n_neg:
        sel = rng.permutation(len(ns))[:n_neg]
        ns, no = ns[sel], no[sel]

    pairs = np.zeros((max_pairs, 2), np.int32)
    labels = np.zeros((max_pairs,), np.int32)
    valid = np.zeros((max_pairs,), bool)
    k = len(ps)
    pairs[:k, 0], pairs[:k, 1] = ps, po
    labels[:k] = pos_labels
    pairs[k : k + len(ns), 0], pairs[k : k + len(ns), 1] = ns, no
    valid[: k + len(ns)] = True
    return pairs, labels, valid


def all_test_pairs(n_valid: int, max_n: int) -> tuple[np.ndarray, np.ndarray]:
    """All ordered pairs i != j over max_n slots; validity from n_valid
    (ref: sampling.py:44-67 prepare_test_pairs)."""
    P = max_n * (max_n - 1)
    pairs = np.zeros((P, 2), np.int32)
    valid = np.zeros((P,), bool)
    k = 0
    for i in range(max_n):
        for j in range(max_n):
            if i != j:
                pairs[k] = (i, j)
                valid[k] = i < n_valid and j < n_valid
                k += 1
    return pairs, valid


def _np_box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    ar = lambda x: np.clip(x[:, 2] - x[:, 0], 0, None) * np.clip(
        x[:, 3] - x[:, 1], 0, None
    )
    union = ar(a)[:, None] + ar(b)[None] - inter
    return inter / np.maximum(union, 1e-9)


def detect_relsample(
    det_boxes: np.ndarray,  # (N, 4) detections (image pixels)
    det_labels: np.ndarray,  # (N,) 1-based; 0 = bg/invalid
    gt_boxes: np.ndarray,  # (G, 4)
    gt_labels: np.ndarray,  # (G,) 1-based
    relation_map: np.ndarray,  # (G, G) predicate (1-based) or 0
    max_pairs: int,
    pos_iou_thr: float = 0.5,
    pos_fraction: float = 0.25,
    require_overlap: bool = False,
    rng: np.random.Generator | None = None,
):
    """sgdet-mode relation sampling (ref: sampling.py:187-271 + the MOTIFS
    fg/bg sampler): detections match GT instances of the SAME label with
    IoU > pos_iou_thr; GT relations map to every matched detection pair
    (foreground), remaining non-bg detection pairs are background. Returns
    fixed-shape (pairs, labels, valid)."""
    rng = rng or np.random.default_rng()
    N = det_boxes.shape[0]
    ious = _np_box_iou(gt_boxes, det_boxes)  # (G, N)
    is_match = (gt_labels[:, None] == det_labels[None]) & (ious > pos_iou_thr)
    fg_det = det_labels > 0

    pos_pairs, pos_labels = [], []
    gs, go = np.nonzero(relation_map)
    for g_s, g_o in zip(gs, go):
        p = relation_map[g_s, g_o]
        ds = np.nonzero(is_match[g_s])[0]
        do = np.nonzero(is_match[g_o])[0]
        for i in ds:
            for j in do:
                if i != j:
                    pos_pairs.append((i, j))
                    pos_labels.append(p)

    num_pos_max = int(max_pairs * pos_fraction)
    if len(pos_pairs) > num_pos_max:
        sel = rng.permutation(len(pos_pairs))[:num_pos_max]
        pos_pairs = [pos_pairs[k] for k in sel]
        pos_labels = [pos_labels[k] for k in sel]

    possible = np.ones((N, N), bool)
    np.fill_diagonal(possible, False)
    possible[~fg_det] = False
    possible[:, ~fg_det] = False
    if require_overlap:
        self_iou = _np_box_iou(det_boxes, det_boxes)
        possible &= (self_iou > 0) & (self_iou < 1)
    for s, o in pos_pairs:
        possible[s, o] = False
    ns, no = np.nonzero(possible)
    n_neg = min(len(ns), max_pairs - len(pos_pairs))
    if len(ns) > n_neg:
        sel = rng.permutation(len(ns))[:n_neg]
        ns, no = ns[sel], no[sel]

    pairs = np.zeros((max_pairs, 2), np.int32)
    labels = np.zeros((max_pairs,), np.int32)
    valid = np.zeros((max_pairs,), bool)
    k = len(pos_pairs)
    if k:
        pairs[:k] = np.asarray(pos_pairs, np.int32)
        labels[:k] = np.asarray(pos_labels, np.int32)
    pairs[k : k + len(ns), 0], pairs[k : k + len(ns), 1] = ns, no
    valid[: k + len(ns)] = True
    return pairs, labels, valid
