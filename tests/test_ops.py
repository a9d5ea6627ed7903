"""Unit tests for core ops vs reference (numpy / torch) semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.ops.boxes import (
    box_iou,
    cxcywh_to_xyxy,
    generalized_box_iou,
    mask_iou,
    masks_to_boxes,
    xyxy_to_cxcywh,
)
from pairnet_tpu.ops.deform_attn import ms_deform_attn
from pairnet_tpu.ops.nms import batched_nms, nms
from pairnet_tpu.ops.sampling import point_sample


def test_point_sample_vs_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    H, W, C, P = 13, 17, 4, 50
    feat = rng.normal(size=(H, W, C)).astype(np.float32)
    pts = rng.uniform(-0.1, 1.1, size=(P, 2)).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(feat), jnp.asarray(pts)))

    t_feat = torch.from_numpy(feat).permute(2, 0, 1)[None]  # (1,C,H,W)
    grid = torch.from_numpy(pts * 2 - 1)[None, None]  # (1,1,P,2)
    ref = F.grid_sample(t_feat, grid, align_corners=False, padding_mode="zeros")
    ref = ref[0, :, 0, :].T.numpy()  # (P, C)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _np_ms_deform_attn(value, shapes, locs, weights):
    """Numpy reference for the CUDA ms_deform_attn semantics."""
    B, S, H, D = value.shape
    Q = locs.shape[1]
    out = np.zeros((B, Q, H, D), np.float32)
    offs = np.cumsum([0] + [h * w for h, w in shapes])
    for b in range(B):
        for lvl, (h, w) in enumerate(shapes):
            v = value[b, offs[lvl] : offs[lvl + 1]].reshape(h, w, H, D)
            for q in range(Q):
                for hd in range(H):
                    for p in range(locs.shape[4]):
                        x = locs[b, q, hd, lvl, p, 0] * w - 0.5
                        y = locs[b, q, hd, lvl, p, 1] * h - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        acc = np.zeros(D, np.float32)
                        for dy in (0, 1):
                            for dx in (0, 1):
                                xi, yi = x0 + dx, y0 + dy
                                if 0 <= xi < w and 0 <= yi < h:
                                    wgt = (1 - abs(x - xi)) * (1 - abs(y - yi))
                                    acc += wgt * v[yi, xi, hd]
                        out[b, q, hd] += weights[b, q, hd, lvl, p] * acc
    return out.reshape(B, Q, H * D)


def test_ms_deform_attn_vs_numpy():
    rng = np.random.default_rng(1)
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 2, 2, 4, 5, 3
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, Q, H, len(shapes), P, 2)).astype(
        np.float32
    )
    w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
    w /= w.sum(axis=(-1, -2), keepdims=True)

    ours = np.asarray(
        ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w))
    )
    ref = _np_ms_deform_attn(value, shapes, locs, w)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_box_convert_roundtrip_and_iou():
    rng = np.random.default_rng(2)
    b = rng.uniform(0, 100, size=(7, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + np.abs(b[:, 2:]) * 0.3 + 1
    back = np.asarray(cxcywh_to_xyxy(xyxy_to_cxcywh(jnp.asarray(b))))
    np.testing.assert_allclose(back, b, atol=1e-4)

    iou, _ = box_iou(jnp.asarray(b), jnp.asarray(b))
    np.testing.assert_allclose(np.diag(np.asarray(iou)), 1.0, atol=1e-5)
    g = np.asarray(generalized_box_iou(jnp.asarray(b), jnp.asarray(b)))
    assert (g <= 1.0 + 1e-5).all() and (g >= -1.0 - 1e-5).all()


def test_masks_to_boxes():
    m = np.zeros((3, 10, 12), np.float32)
    m[0, 2:5, 3:7] = 1  # box (3, 2, 7, 5)
    m[1, 0, 0] = 1  # box (0, 0, 1, 1)
    boxes = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_allclose(boxes[0], [3, 2, 7, 5])
    np.testing.assert_allclose(boxes[1], [0, 0, 1, 1])
    np.testing.assert_allclose(boxes[2], [0, 0, 0, 0])  # empty


def test_mask_iou():
    a = np.zeros((2, 8, 8), np.float32)
    b = np.zeros((2, 8, 8), np.float32)
    a[0, :4] = 1
    b[0, 2:6] = 1  # overlap 2 rows of 4 -> iou 16/48
    a[1, :, :] = 1
    b[1, :4] = 1  # iou 0.5
    iou = np.asarray(mask_iou(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == pytest.approx(16 / 48)
    assert iou[1, 1] == pytest.approx(0.5)


def test_nms_matches_torchvision_semantics():
    rng = np.random.default_rng(3)
    N = 40
    boxes = rng.uniform(0, 50, size=(N, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 20, size=(N, 2))
    scores = rng.uniform(size=N).astype(np.float32)

    keep = np.asarray(nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5))

    # numpy greedy reference
    order = np.argsort(-scores)
    ref_keep = np.zeros(N, bool)
    supp = np.zeros(N, bool)

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[0] * wh[1]
        ar = lambda x: (x[2] - x[0]) * (x[3] - x[1])
        return inter / (ar(a) + ar(b) - inter)

    for i in order:
        if supp[i]:
            continue
        ref_keep[i] = True
        for j in order:
            if j != i and not supp[j] and iou(boxes[i], boxes[j]) > 0.5:
                supp[j] = True
    np.testing.assert_array_equal(keep, ref_keep)


def test_batched_nms_separates_classes():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    # same class -> second suppressed
    k1 = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 0]), 0.5))
    assert k1.tolist() == [True, False]
    # different classes -> both kept
    k2 = np.asarray(batched_nms(boxes, scores, jnp.asarray([0, 1]), 0.5))
    assert k2.tolist() == [True, True]


def test_ms_deform_attn_patch_matches_rows():
    """The fast 2x2-patch gather path is exact vs the row-gather path."""
    rng = np.random.default_rng(7)
    shapes = ((6, 8), (3, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 2, 2, 4, 9, 3
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, size=(B, Q, H, len(shapes), P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, len(shapes), P)).astype(np.float32)
    a = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), impl="rows")
    b = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w), impl="patch")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
