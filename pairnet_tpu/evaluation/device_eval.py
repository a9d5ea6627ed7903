"""On-device (jit) scene-graph recall evaluation.

The reference computes triplet matching with per-image numpy loops over
full-resolution mask IoUs (ref: sgg_metrics.py:1311-1379 — the eval hot loop,
SURVEY.md §3.2). Here the whole per-image computation is one jit program:

* mask IoUs via flattened one-hot matmuls on the MXU,
* class-equality prefilter as an integer equality matrix,
* graph-constraint matching and top-K union recall with fixed shapes.

Validated against the numpy reference engine (evaluation/sgg_eval.py) in
tests/test_device_eval.py. Aggregation (means over images / predicates)
stays on host — it is O(images), not O(pixels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("topks", "phrdet"))
def device_eval_single(
    gt_labels,  # (G,) 1-based; 0 = padding
    gt_rels,  # (R, 3) [sub, obj, predicate_1based]; predicate 0 = padding
    gt_masks,  # (G, H, W) bool/f32
    pred_labels,  # (M,) 1-based
    pred_pairs,  # (K, 2) indices into pred arrays, RANKED
    pred_rel_dists,  # (K, P+1)
    pred_masks,  # (M, H, W) bool/f32
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
    phrdet: bool = False,
):
    """Returns (matched@k (len(topks), R) bool, rel_valid (R,)) — plus
    phrdet-matched@k first when ``phrdet`` (union-region matching, ref:
    sgg_metrics.py:241-252: the union mask of sub+obj must reach iou_thr
    instead of both endpoints)."""
    G = gt_labels.shape[0]
    R = gt_rels.shape[0]
    K = pred_pairs.shape[0]

    rel_valid = gt_rels[:, 2] > 0
    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    gt_trip = jnp.stack(
        [gt_labels[sub_gt], gt_rels[:, 2], gt_labels[obj_gt]], -1
    )  # (R, 3)

    pred_predicate = pred_rel_dists[:, 1:].argmax(-1).astype(jnp.int32) + 1
    pred_trip = jnp.stack(
        [
            pred_labels[pred_pairs[:, 0]],
            pred_predicate,
            pred_labels[pred_pairs[:, 1]],
        ],
        -1,
    )  # (K, 3)

    cls_match = (gt_trip[:, None, :] == pred_trip[None, :, :]).all(-1)  # (R, K)

    # mask IoUs via matmul: gt instance x pred instance, then index per pair
    gm = gt_masks.reshape(G, -1).astype(jnp.float32)
    pm = pred_masks.reshape(pred_masks.shape[0], -1).astype(jnp.float32)
    inter = jnp.dot(gm, pm.T, preferred_element_type=jnp.float32)
    union = gm.sum(-1)[:, None] + pm.sum(-1)[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)  # (G, M)

    sub_iou = iou[sub_gt][:, pred_pairs[:, 0]]  # (R, K)
    obj_iou = iou[obj_gt][:, pred_pairs[:, 1]]
    match = cls_match & (sub_iou >= iou_thr) & (obj_iou >= iou_thr)
    match = match & rel_valid[:, None]

    def topk_any(m):
        outs = []
        for k in topks:
            kk = min(k, K)
            outs.append(m[:, :kk].any(axis=1))
        return jnp.stack(outs)

    if not phrdet:
        return topk_any(match), rel_valid

    # phrdet: one IoU of the union regions per (gt rel, pred pair)
    gu = jnp.maximum(gm[sub_gt], gm[obj_gt])  # (R, HW) union masks
    pu = jnp.maximum(pm[pred_pairs[:, 0]], pm[pred_pairs[:, 1]])  # (K, HW)
    inter_u = jnp.dot(gu, pu.T, preferred_element_type=jnp.float32)
    union_u = gu.sum(-1)[:, None] + pu.sum(-1)[None, :] - inter_u
    iou_u = inter_u / jnp.maximum(union_u, 1e-9)  # (R, K)
    match_phr = cls_match & (iou_u >= iou_thr) & rel_valid[:, None]
    return topk_any(match), topk_any(match_phr), rel_valid


@functools.partial(jax.jit, static_argnames=("topks",))
def device_eval_twostage_single(
    gt_labels,  # (G,) 1-based; 0 = padding
    gt_rels,  # (R, 3) [sub, obj, predicate_1based]; predicate 0 = padding
    gt_masks,  # (G, H, W) bool/f32
    pred_labels,  # (M,) 1-based (gt labels for predcls, predicted for sgcls)
    pred_pairs,  # (K, 2) indices into pred arrays, RANKED
    pred_rel_dists,  # (K, P+1)
    pred_masks,  # (M, H, W) bool/f32 — GT regions for predcls/sgcls
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
):
    """Device twins of the two-stage eval extras (VERDICT r4 #6).

    Returns ``(matched@k, matched_pair@k, rel_valid, best_sub_iou,
    best_obj_iou, has_cand)``:

    * ``matched@k`` — the graph-constraint recall matching of
      :func:`device_eval_single` (no phrdet: the oracle computes phrdet
      only for sgdet, ref sgg_metrics.py:241-252);
    * ``matched_pair@k`` — SGPairAccuracy's restricted matching (ref:
      sgg_metrics.py:537-667): predictions whose (sub, obj) index pair
      appears among the GT pairs, matched with GT-GROUNDED triplets
      (``_triplets(pred_rels, gt.labels, gt_dets)``, sgg_eval.py:300) and
      top-k counted over the restricted ranking only;
    * ``best_sub_iou / best_obj_iou / has_cand`` — SGObjectIOU's per-GT-rel
      best subject/object IoU over class-matching candidates (ref:
      sgg_metrics.py:942-1086), using the PREDICTED labels.

    Precondition for the pair-accuracy twin: predictions are grounded in
    the GT regions (``pred_masks`` is the GT mask set), which holds for
    predcls/sgcls where detections ARE the GT objects.
    """
    G = gt_labels.shape[0]
    K = pred_pairs.shape[0]

    rel_valid = gt_rels[:, 2] > 0
    sub_gt = jnp.clip(gt_rels[:, 0], 0, G - 1)
    obj_gt = jnp.clip(gt_rels[:, 1], 0, G - 1)
    gt_trip = jnp.stack(
        [gt_labels[sub_gt], gt_rels[:, 2], gt_labels[obj_gt]], -1
    )  # (R, 3)

    pred_predicate = pred_rel_dists[:, 1:].argmax(-1).astype(jnp.int32) + 1
    psub = jnp.clip(pred_pairs[:, 0], 0, pred_labels.shape[0] - 1)
    pobj = jnp.clip(pred_pairs[:, 1], 0, pred_labels.shape[0] - 1)
    pred_trip = jnp.stack(
        [pred_labels[psub], pred_predicate, pred_labels[pobj]], -1
    )  # (K, 3)
    cls_match = (gt_trip[:, None, :] == pred_trip[None, :, :]).all(-1)

    gm = gt_masks.reshape(G, -1).astype(jnp.float32)
    pm = pred_masks.reshape(pred_masks.shape[0], -1).astype(jnp.float32)
    inter = jnp.dot(gm, pm.T, preferred_element_type=jnp.float32)
    union = gm.sum(-1)[:, None] + pm.sum(-1)[None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)  # (G, M)
    sub_iou = iou[sub_gt][:, psub]  # (R, K)
    obj_iou = iou[obj_gt][:, pobj]
    iou_ok = (sub_iou >= iou_thr) & (obj_iou >= iou_thr)
    match = cls_match & iou_ok & rel_valid[:, None]

    def topk_any(m, gate=None):
        outs = []
        for k in topks:
            sel = m
            if gate is not None:
                sel = m & gate(k)
            outs.append(sel.any(axis=1))
        return jnp.stack(outs)

    def plain(m):
        outs = []
        for k in topks:
            kk = min(k, K)
            outs.append(m[:, :kk].any(axis=1))
        return jnp.stack(outs)

    matched = plain(match)

    # --- SGPairAccuracy twin: GT-grounded triplets, restricted ranking ---
    gt_pair_eq = (
        (pred_pairs[:, None, :] == gt_rels[None, :, :2]).all(-1)
        & rel_valid[None, :]
    )  # (K, R)
    in_gt = gt_pair_eq.any(axis=1)  # (K,)
    rank = jnp.cumsum(in_gt.astype(jnp.int32)) - 1  # rank within restricted
    pred_trip_gt = jnp.stack(
        [gt_labels[psub], pred_predicate, gt_labels[pobj]], -1
    )
    pair_cls = (gt_trip[:, None, :] == pred_trip_gt[None, :, :]).all(-1)
    pair_match = pair_cls & iou_ok & rel_valid[:, None]
    matched_pair = topk_any(
        pair_match & in_gt[None, :], gate=lambda k: (rank < k)[None, :]
    )

    # --- SGObjectIOU twin: best IoU over class-matching candidates ---
    has_cand = cls_match.any(axis=1) & rel_valid
    neg = jnp.float32(-1.0)
    best_sub = jnp.max(jnp.where(cls_match, sub_iou, neg), axis=1)
    best_obj = jnp.max(jnp.where(cls_match, obj_iou, neg), axis=1)

    return matched, matched_pair, rel_valid, best_sub, best_obj, has_cand


class SgdetAccumulator:
    """Host-side aggregation of per-image device match results into the
    numpy oracle's FULL sgdet metric dict: R@K, mR@K, thing/stuff 4-group
    recall and phrdet (ref: sgg_metrics.py:101-124, 241-252 — VERDICT r3
    #6). All inputs are per-image O(R) arrays; no mask work happens here.
    """

    GROUPS = ("tt", "ts", "st", "ss")

    def __init__(self, num_predicates: int, num_things: int,
                 topks: tuple = (20, 50, 100), twostage: bool = False):
        self.num_predicates = num_predicates
        self.num_things = num_things
        self.topks = topks
        self.twostage = twostage  # emit pair-accuracy / object-IoU keys
        self.recalls = {k: [] for k in topks}
        self.phr_recalls = {k: [] for k in topks}
        self.mr_collect = {
            k: [[] for _ in range(num_predicates + 1)] for k in topks
        }
        self.group_recall = [{k: [] for k in topks} for _ in range(4)]
        # two-stage extras (device twins of sg_pair_accuracy/sg_object_iou)
        self.pair_acc = {k: [] for k in topks}
        self.oiu_sum = 0.0
        self.oiu_n = 0
        self.oiu_above = 0

    def add_twostage(self, matched_pair, best_sub, best_obj, has_cand,
                     rel_valid, iou_thr: float = 0.5):
        """Accumulate the extras of :func:`device_eval_twostage_single`."""
        rv = np.asarray(rel_valid)
        if not rv.any():
            return
        n_gt = int(rv.sum())
        matched_pair = np.asarray(matched_pair)
        for ki, k in enumerate(self.topks):
            self.pair_acc[k].append((matched_pair[ki] & rv).sum() / n_gt)
        hc = np.asarray(has_cand) & rv
        ious = np.concatenate(
            [np.asarray(best_sub)[hc], np.asarray(best_obj)[hc]]
        )
        self.oiu_sum += float(ious.sum())
        self.oiu_n += int(ious.size)
        self.oiu_above += int((ious > iou_thr).sum())

    def add(self, matched, matched_phr, rel_valid, gt_rels, gt_labels):
        """matched/matched_phr (len(topks), R) bool; gt_rels (R, 3) with
        0-padded predicates; gt_labels (G,) 1-based."""
        matched = np.asarray(matched)
        rv = np.asarray(rel_valid)
        if not rv.any():
            # the oracle skips relation-less images entirely
            return
        n_gt = int(rv.sum())
        gt_rels = np.asarray(gt_rels)
        gt_labels = np.asarray(gt_labels)
        predicates = gt_rels[:, 2]
        nt = self.num_things
        sub_lab = gt_labels[np.clip(gt_rels[:, 0], 0, len(gt_labels) - 1)]
        obj_lab = gt_labels[np.clip(gt_rels[:, 1], 0, len(gt_labels) - 1)]
        grp = (sub_lab > nt).astype(int) * 2 + (obj_lab > nt).astype(int)
        for ki, k in enumerate(self.topks):
            hits = matched[ki] & rv
            self.recalls[k].append(hits.sum() / n_gt)
            for p in range(1, self.num_predicates + 1):
                sel = rv & (predicates == p)
                if sel.any():
                    self.mr_collect[k][p].append(matched[ki][sel].mean())
            for j in range(4):
                sel = rv & (grp == j)
                cnt = int(sel.sum())
                if cnt > 0:
                    self.group_recall[j][k].append(hits[sel].sum() / cnt)
            if matched_phr is not None:
                phr = np.asarray(matched_phr)
                self.phr_recalls[k].append((phr[ki] & rv).sum() / n_gt)

    def _bucket_stats(self):
        """Fixed-shape (sum, count) arrays per metric bucket — the exact
        sufficient statistics for every mean this accumulator reports, so
        they are what crosses hosts in the multi-process gather."""
        T = len(self.topks)
        P = self.num_predicates
        s = {
            "rec": np.zeros((T, 2)),
            "phr": np.zeros((T, 2)),
            "mr": np.zeros((T, P + 1, 2)),
            "grp": np.zeros((4, T, 2)),
            "pair": np.zeros((T, 2)),
            "oiu": np.zeros(3),  # (sum of best IoUs, count, count > thr)
        }
        for ki, k in enumerate(self.topks):
            s["rec"][ki] = (np.sum(self.recalls[k]), len(self.recalls[k]))
            s["phr"][ki] = (
                np.sum(self.phr_recalls[k]), len(self.phr_recalls[k])
            )
            s["pair"][ki] = (np.sum(self.pair_acc[k]), len(self.pair_acc[k]))
            for p in range(1, P + 1):
                v = self.mr_collect[k][p]
                s["mr"][ki, p] = (np.sum(v), len(v))
            for j in range(4):
                v = self.group_recall[j][k]
                s["grp"][j, ki] = (np.sum(v), len(v))
        s["oiu"][:] = (self.oiu_sum, self.oiu_n, self.oiu_above)
        return s

    def summarize(self, mode: str = "sgdet", gather: bool = False) -> dict:
        """Metric dict from the accumulated stats.

        ``gather=True`` merges stats across JAX processes first (counterpart
        of multi_gpu_test's result collection, ref: tools/test.py:255-267):
        each host evaluates a disjoint image shard; the per-bucket (sum,
        count) pairs allgather-reduce exactly (every reported metric is a
        mean of per-image scalars). Single-process: a no-op.

        CAVEAT: this dev environment is single-process, so the
        ``process_allgather`` branch itself has never crossed real hosts;
        the reduction it performs (summing the bucket arrays) is pinned by
        ``tests/test_multidevice_eval.py::
        test_accumulator_gather_stats_merge_exactly``.
        """
        import jax

        s = self._bucket_stats()
        if gather and jax.process_count() > 1:
            from jax.experimental import multihost_utils

            s = jax.tree_util.tree_map(
                lambda x: np.asarray(
                    multihost_utils.process_allgather(x)
                ).sum(axis=0),
                s,
            )

        def mean(pair):
            return float(pair[0] / pair[1]) if pair[1] else 0.0

        out = {}
        for ki, k in enumerate(self.topks):
            out[f"{mode}_recall_R@{k}"] = mean(s["rec"][ki])
        for ki, k in enumerate(self.topks):
            mr = sum(
                mean(s["mr"][ki, p])
                for p in range(1, self.num_predicates + 1)
            )
            out[f"{mode}_mean_recall_mR@{k}"] = mr / self.num_predicates
        for j, name in enumerate(self.GROUPS):
            for ki, k in enumerate(self.topks):
                out[f"{mode}_group_{name}_R@{k}"] = mean(s["grp"][j, ki])
        if s["phr"][:, 1].any():
            for ki, k in enumerate(self.topks):
                out[f"phrdet_recall_R@{k}"] = mean(s["phr"][ki])
        if self.twostage:
            for ki, k in enumerate(self.topks):
                out[f"pair_accuracy_A@{k}"] = mean(s["pair"][ki])
            n = s["oiu"][1]
            out["object_mean_iou"] = float(s["oiu"][0] / n) if n else 0.0
            out["object_iou_recall"] = float(s["oiu"][2] / n) if n else 0.0
        return out


def evaluate_device(
    gts: list[dict],
    preds: list[dict],
    num_predicates: int,
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
    num_things: int = 80,
) -> dict:
    """Dataset-level sgdet metric dict using the on-device matcher.

    Entries carry the arrays of :func:`device_eval_single`; images may have
    different mask resolutions (one compile per distinct shape). Returns the
    oracle's key set (``sgdet_recall_R@K`` etc.) plus legacy short aliases.
    """
    acc = SgdetAccumulator(num_predicates, num_things, topks)
    for gt, pred in zip(gts, preds):
        matched, matched_phr, rel_valid = device_eval_single(
            jnp.asarray(gt["labels"]),
            jnp.asarray(gt["rels"]),
            jnp.asarray(gt["masks"]),
            jnp.asarray(pred["labels"]),
            jnp.asarray(pred["rel_pair_idxes"]),
            jnp.asarray(pred["rel_dists"]),
            jnp.asarray(pred["masks"]),
            iou_thr,
            topks,
            phrdet=True,
        )
        acc.add(matched, matched_phr, rel_valid, gt["rels"], gt["labels"])
    out = acc.summarize("sgdet")
    for k in topks:  # legacy short keys
        out[f"R@{k}"] = out[f"sgdet_recall_R@{k}"]
        out[f"mR@{k}"] = out[f"sgdet_mean_recall_mR@{k}"]
    return out
