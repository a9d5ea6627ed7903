"""Device evaluator parity vs the numpy reference recall engine."""

import numpy as np
import pytest

from pairnet_tpu.evaluation.device_eval import evaluate_device
from pairnet_tpu.evaluation.sgg_eval import (
    SGGroundTruth,
    SGPrediction,
    sg_object_iou,
    sg_pair_accuracy,
    sgg_evaluate,
)


def _random_case(rng, G=6, K=20, P=5, H=24, W=24):
    n_valid = int(rng.integers(2, G + 1))
    labels = rng.integers(1, 6, size=G).astype(np.int64)
    masks = np.zeros((G, H, W), bool)
    for g in range(n_valid):
        y, x = rng.integers(0, H - 8), rng.integers(0, W - 8)
        masks[g, y : y + 8, x : x + 8] = True
    n_rel = int(rng.integers(1, 4))
    rels = np.stack([
        rng.integers(0, n_valid, n_rel),
        rng.integers(0, n_valid, n_rel),
        rng.integers(1, P + 1, n_rel),
    ], -1).astype(np.int64)
    gt = SGGroundTruth(labels=labels, rels=rels, masks=masks)

    # predictions: first few reproduce GT (with noise), rest random
    pred_masks = np.zeros((2 * K, H, W), bool)
    pred_labels = np.zeros(2 * K, np.int64)
    dists = np.zeros((K, P + 1), np.float32)
    for k in range(K):
        if k < n_rel and rng.random() < 0.7:
            s, o, p = rels[k]
            pred_masks[k] = masks[s]
            pred_masks[k + K] = masks[o]
            pred_labels[k] = labels[s]
            pred_labels[k + K] = labels[o]
            dists[k, p] = 1.0
        else:
            y, x = rng.integers(0, H - 6), rng.integers(0, W - 6)
            pred_masks[k, y : y + 6, x : x + 6] = True
            pred_masks[k + K, : 6, : 6] = True
            pred_labels[k] = rng.integers(1, 6)
            pred_labels[k + K] = rng.integers(1, 6)
            dists[k, rng.integers(1, P + 1)] = 1.0
    pairs = np.stack([np.arange(K), np.arange(K) + K], -1)
    pred = SGPrediction(
        labels=pred_labels, rel_pair_idxes=pairs, rel_dists=dists,
        masks=pred_masks,
    )
    return gt, pred


def test_device_matches_numpy_engine():
    rng = np.random.default_rng(0)
    # num_things=3: labels are 1..5, so both thing (<=3) and stuff (>3)
    # endpoints occur and the 4-group breakdown is non-trivial
    cases = [_random_case(rng) for _ in range(6)]
    gts = [c[0] for c in cases]
    preds = [c[1] for c in cases]

    ref = sgg_evaluate(
        gts, preds, mode="sgdet", num_predicates=5, num_things=3
    )
    dev = evaluate_device(
        [dict(labels=g.labels, rels=g.rels, masks=g.masks) for g in gts],
        [dict(labels=p.labels, rel_pair_idxes=p.rel_pair_idxes,
              rel_dists=p.rel_dists, masks=p.masks) for p in preds],
        num_predicates=5,
        num_things=3,
    )
    # FULL oracle key-set parity (VERDICT r3 #6): recall, mean recall,
    # thing/stuff 4-group recall, phrdet
    for key, val in ref.items():
        assert key in dev, key
        assert abs(val - dev[key]) < 1e-6, (key, val, dev[key])
    for k in (20, 50, 100):  # legacy aliases kept
        assert dev[f"R@{k}"] == dev[f"sgdet_recall_R@{k}"]


def _grounded_case(rng, G=6, K=18, P=5, H=24, W=24):
    """predcls/sgcls-style case: predictions index the GT objects."""
    labels = rng.integers(1, 6, size=G).astype(np.int64)
    masks = np.zeros((G, H, W), bool)
    for g in range(G):
        y, x = rng.integers(0, H - 8), rng.integers(0, W - 8)
        masks[g, y : y + 8, x : x + 8] = True
    n_rel = int(rng.integers(1, 4))
    rels = np.stack([
        rng.integers(0, G, n_rel),
        rng.integers(0, G, n_rel),
        rng.integers(1, P + 1, n_rel),
    ], -1).astype(np.int64)
    gt = SGGroundTruth(labels=labels, rels=rels, masks=masks)

    # ~half the predicted pairs reproduce GT pairs (sometimes with the
    # right predicate), the rest are random ordered pairs
    pairs = np.zeros((K, 2), np.int64)
    dists = np.zeros((K, P + 1), np.float32)
    for k in range(K):
        if k < n_rel and rng.random() < 0.7:
            pairs[k] = rels[k, :2]
            dists[k, rels[k, 2] if rng.random() < 0.8 else rng.integers(1, P + 1)] = 1.0
        else:
            pairs[k] = rng.integers(0, G, 2)
            dists[k, rng.integers(1, P + 1)] = 1.0
    order = rng.permutation(K)
    # sgcls: predicted labels are noisy GT labels
    sg_labels = np.where(rng.random(G) < 0.7, labels, rng.integers(1, 6, G))
    pred = SGPrediction(
        labels=sg_labels.astype(np.int64),
        rel_pair_idxes=pairs[order],
        rel_dists=dists[order],
        masks=masks,
    )
    return gt, pred


@pytest.mark.parametrize("mode", ["predcls", "sgcls"])
def test_twostage_device_engine_matches_oracle(mode):
    """predcls/sgcls device route (recall + SGPairAccuracy + SGObjectIOU
    twins) reproduces the numpy oracle trio (VERDICT r4 #6)."""
    from dataclasses import replace

    from pairnet_tpu.evaluation.runner import _twostage_device_metrics

    rng = np.random.default_rng(3)
    cases = [_grounded_case(rng) for _ in range(6)]
    gts = [c[0] for c in cases]
    # runner convention: predcls grounds labels in GT before both engines
    preds = [
        replace(c[1], labels=g.labels) if mode == "predcls" else c[1]
        for c, g in zip(cases, gts)
    ]

    ref = sgg_evaluate(gts, preds, mode=mode, num_predicates=5, num_things=3)
    ref.update(sg_pair_accuracy(gts, preds, num_things=3))
    ref.update(sg_object_iou(gts, preds))

    dev = _twostage_device_metrics(
        gts, preds, mode, num_predicates=5, num_things=3, iou_thr=0.5
    )
    assert set(ref) == set(dev), set(ref) ^ set(dev)
    for key, val in ref.items():
        assert abs(val - dev[key]) < 1e-6, (key, val, dev[key])
