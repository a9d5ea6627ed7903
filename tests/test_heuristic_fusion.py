"""Heuristic panoptic fusion -> per-segment boxes/labels (two-stage sgdet).

mmdet HeuristicFusionHead semantics (ref: sg_panoptic_fpn.py:57-142 +
configs/_base_/models/panoptic_fpn_r50_fpn_psg.py:25-34): score-descending
painting with a 0.5 overlap skip, stuff regions from the semantic argmax
gated by the area limit, segments = things + stuff with 1-based combined
labels.
"""

import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.frameworks.panoptic_fpn import (
    Detections,
    heuristic_fusion_segments,
)

T, S = 4, 3  # things / stuff classes


def _mk(dets_masks, scores, labels, sem_cls):
    """Build inputs: masks bool (N,h,w), sem from a per-pixel class map."""
    N, h, w = dets_masks.shape
    logits = np.where(dets_masks, 5.0, -5.0).astype(np.float32)
    sem = np.full((h, w, S + 1), -5.0, np.float32)
    for c in range(S + 1):
        sem[..., c] = np.where(sem_cls == c, 5.0, -5.0)
    dists = np.zeros((N, T + 1), np.float32)
    for i, l in enumerate(labels):
        if l > 0:
            dists[i, l - 1] = scores[i]
    dets = Detections(
        boxes=jnp.zeros((1, N, 4)),
        labels=jnp.asarray(labels, jnp.int32)[None],
        scores=jnp.asarray(scores, jnp.float32)[None],
        dists=jnp.asarray(dists)[None],
        valid=jnp.asarray(np.asarray(labels) > 0)[None],
    )
    return dets, jnp.asarray(logits)[None], jnp.asarray(sem)[None]


def test_overlap_skip_and_stuff_segments():
    h, w = 40, 40
    masks = np.zeros((3, h, w), bool)
    masks[0, 0:20, 0:20] = True          # high score, painted first
    masks[1, 0:18, 0:18] = True          # 81% covered by det 0 -> skipped
    masks[2, 20:36, 0:30] = True         # disjoint -> kept
    scores = [0.9, 0.8, 0.7]
    labels = [2, 3, 1]
    sem_cls = np.zeros((h, w), np.int64)  # channel 0 = things everywhere
    sem_cls[:, 30:] = 1                   # stuff class 1 region: 40x10=400 px
    dets, logits, sem = _mk(masks, scores, labels, sem_cls)

    seg = heuristic_fusion_segments(
        dets, logits, sem, num_things=T, num_stuff=S,
        mask_stride=4, stuff_area_limit=4096,
    )
    valid = np.asarray(seg.valid[0])
    # det 0 kept, det 1 skipped (overlap), det 2 kept
    assert valid[0] and not valid[1] and valid[2]
    # stuff class 1 area = 400 at stride 4 => 6400 px^2 >= 4096 -> kept;
    # stuff classes 2/3 absent
    assert valid[3] and not valid[4] and not valid[5]
    lab = np.asarray(seg.labels[0])
    assert lab[0] == 2 and lab[2] == 1
    assert lab[3] == T + 1  # first stuff class, combined 1-based
    # stuff region excludes pixels claimed by instances (none here overlap)
    m_stuff = np.asarray(seg.masks[0, 3])
    assert m_stuff[:, 30:].all() and not m_stuff[:, :30].any()
    # boxes in input pixels (stride 4)
    b = np.asarray(seg.boxes[0])
    np.testing.assert_array_equal(b[0], [0, 0, 80, 80])
    np.testing.assert_array_equal(b[3], [120, 0, 160, 160])
    # stuff dist is a unit one-hot at the combined label
    d = np.asarray(seg.dists[0, 3])
    assert d[T] == 1.0 and d.sum() == 1.0


def test_painter_priority_masks_disjoint():
    h, w = 16, 16
    masks = np.zeros((2, h, w), bool)
    masks[0, 0:10, 0:10] = True
    masks[1, 6:16, 6:16] = True  # overlaps 16/100 = 16% -> kept, cropped
    dets, logits, sem = _mk(
        masks, [0.9, 0.8], [1, 2], np.zeros((h, w), np.int64)
    )
    seg = heuristic_fusion_segments(
        dets, logits, sem, num_things=T, num_stuff=S, stuff_area_limit=10**9
    )
    m0 = np.asarray(seg.masks[0, 0])
    m1 = np.asarray(seg.masks[0, 1])
    assert np.asarray(seg.valid[0])[:2].all()
    assert not (m0 & m1).any()  # painter's algorithm: disjoint output
    assert m0.sum() == 100 and m1.sum() == 100 - 16
