"""Recall-engine tests on hand-constructed graphs with known answers."""

import numpy as np
import pytest

from pairnet_tpu.evaluation.sgg_eval import (
    SGGroundTruth,
    SGPrediction,
    intersect_2d,
    sgg_evaluate,
)

H, W = 32, 32


def _mask(x0, y0, x1, y1):
    m = np.zeros((H, W), bool)
    m[y0:y1, x0:x1] = True
    return m


def _gt():
    masks = np.stack([_mask(0, 0, 10, 10), _mask(15, 15, 30, 30), _mask(0, 20, 8, 32)])
    labels = np.asarray([3, 5, 90])  # 1-based; 90 = stuff (>80)
    rels = np.asarray([[0, 1, 2], [1, 2, 4]])  # predicates 1-based
    return SGGroundTruth(labels=labels, rels=rels, masks=masks)


def _pred_from_gt(gt, predicate_shift=0, rank_pad=0, mask_jitter=0):
    """Build a prediction whose first triplets reproduce the GT."""
    K = len(gt.rels) + rank_pad
    n = len(gt.labels)
    masks = gt.masks.copy()
    if mask_jitter:
        masks = np.stack([np.roll(m, mask_jitter, axis=1) for m in masks])
    sub_masks, obj_masks, labels, dists = [], [], [], []
    # pad with junk triplets first if rank_pad (to push real ones down)
    entries = []
    for _ in range(rank_pad):
        entries.append((np.zeros((H, W), bool), np.zeros((H, W), bool), 1, 1, 1))
    for s, o, p in gt.rels:
        entries.append(
            (masks[s], masks[o], gt.labels[s], gt.labels[o], p + predicate_shift)
        )
    R = 56
    for sm, om, sl, ol, p in entries:
        sub_masks.append(sm)
        obj_masks.append(om)
        labels.append((sl, ol))
        d = np.zeros(R + 1)
        d[min(p, R)] = 1.0
        dists.append(d)
    K = len(entries)
    all_labels = np.concatenate(
        [np.asarray([l[0] for l in labels]), np.asarray([l[1] for l in labels])]
    )
    all_masks = np.concatenate([np.stack(sub_masks), np.stack(obj_masks)])
    pairs = np.stack([np.arange(K), np.arange(K) + K], axis=1)
    return SGPrediction(
        labels=all_labels,
        rel_pair_idxes=pairs,
        rel_dists=np.stack(dists),
        masks=all_masks,
    )


def test_intersect_2d():
    a = np.asarray([[1, 2], [3, 4]])
    b = np.asarray([[3, 4], [1, 2], [1, 9]])
    m = intersect_2d(a, b)
    assert m.tolist() == [[False, True, False], [True, False, False]]


def test_perfect_prediction():
    gt = _gt()
    pred = _pred_from_gt(gt)
    out = sgg_evaluate([gt], [pred], mode="sgdet")
    assert out["sgdet_recall_R@20"] == 1.0
    assert out["sgdet_recall_R@100"] == 1.0
    assert out["phrdet_recall_R@20"] == 1.0


def test_wrong_predicate_graph_constraint_vs_pairdet():
    gt = _gt()
    pred = _pred_from_gt(gt, predicate_shift=1)
    out = sgg_evaluate([gt], [pred], mode="sgdet")
    assert out["sgdet_recall_R@100"] == 0.0
    out_pair = sgg_evaluate([gt], [pred], mode="pairdet")
    assert out_pair["pairdet_recall_R@100"] == 1.0  # predicate ignored


def test_mask_iou_threshold():
    gt = _gt()
    # shift masks enough to fall under IoU 0.5: 10-wide mask shifted by 8
    pred = _pred_from_gt(gt, mask_jitter=8)
    out = sgg_evaluate([gt], [pred], mode="sgdet")
    assert out["sgdet_recall_R@100"] == 0.0


def test_ranking_respected():
    gt = _gt()
    pred = _pred_from_gt(gt, rank_pad=30)
    out = sgg_evaluate([gt], [pred], mode="sgdet")
    assert out["sgdet_recall_R@20"] == 0.0
    assert out["sgdet_recall_R@50"] == 1.0


def test_mean_recall_per_predicate():
    gt = _gt()
    # only reproduce the first relation (predicate 2); drop the second
    pred = _pred_from_gt(gt)
    pred.rel_dists[1] = 0
    pred.rel_dists[1][10] = 1.0  # wrong predicate for rel 2
    out = sgg_evaluate([gt], [pred], mode="sgdet", num_predicates=56)
    # predicate 2 recall 1.0, predicate 4 recall 0.0, others no GT -> 0
    assert np.isclose(out["sgdet_mean_recall_mR@100"], 1.0 / 56)
    # plain recall: 1 of 2 gt rels
    assert out["sgdet_recall_R@100"] == 0.5


def test_group_breakdown():
    gt = _gt()  # rel0: thing-thing, rel1: thing-stuff
    pred = _pred_from_gt(gt)
    out = sgg_evaluate([gt], [pred], mode="sgdet")
    assert out["sgdet_group_tt_R@100"] == 1.0
    assert out["sgdet_group_ts_R@100"] == 1.0
    assert out["sgdet_group_ss_R@100"] == 0.0  # no ss GT


def test_predcls_substitutes_gt():
    gt = _gt()
    pred = _pred_from_gt(gt, mask_jitter=8)  # masks would fail sgdet
    # but predcls replaces dets with GT; rel_pair_idxes index GT objects now
    pred.rel_pair_idxes = gt.rels[:, :2]
    pred.rel_dists = pred.rel_dists[: len(gt.rels)]
    out = sgg_evaluate([gt], [pred], mode="predcls")
    assert out["predcls_recall_R@100"] == 1.0


def test_pair_accuracy_and_object_iou():
    from pairnet_tpu.evaluation.sgg_eval import sg_object_iou, sg_pair_accuracy

    gt = _gt()
    pred = _pred_from_gt(gt)
    # predictions index GT objects for the pair-accuracy metric (predcls)
    pred.rel_pair_idxes = gt.rels[:, :2].copy()
    pred.rel_dists = pred.rel_dists[: len(gt.rels)]
    acc = sg_pair_accuracy([gt], [pred])
    assert acc["pair_accuracy_A@100"] == 1.0

    pred2 = _pred_from_gt(gt)
    iou = sg_object_iou([gt], [pred2])
    assert iou["object_mean_iou"] == pytest.approx(1.0)
    assert iou["object_iou_recall"] == 1.0


def test_nogc_recall_bbox():
    from pairnet_tpu.evaluation.sgg_eval import sgg_evaluate_nogc

    boxes = np.asarray(
        [[0, 0, 10, 10], [15, 15, 30, 30], [0, 20, 8, 32]], np.float32
    )
    gt = SGGroundTruth(
        labels=np.asarray([3, 5, 9]),
        rels=np.asarray([[0, 1, 2]]),
        boxes=boxes,
    )
    # graph-constraint argmax predicts the WRONG predicate (3), but the
    # correct one (2) is second-best -> nogc recalls it
    dists = np.zeros((1, 6), np.float32)
    dists[0, 3] = 0.5
    dists[0, 2] = 0.4
    pred = SGPrediction(
        labels=gt.labels,
        rel_pair_idxes=np.asarray([[0, 1]]),
        rel_dists=dists,
        boxes=boxes,
        obj_scores=np.ones(3),
    )
    gc = sgg_evaluate([gt], [pred], mode="sgdet", num_predicates=5,
                      detection_method="bbox")
    assert gc["sgdet_recall_R@100"] == 0.0
    nogc = sgg_evaluate_nogc([gt], [pred], num_predicates=5)
    assert nogc["nogc_sgdet_recall_R@100"] == 1.0
