"""Inference-to-evaluation glue: run the model over a split and score it.

Counterpart of tools/test.py's single_gpu_test + dataset.evaluate flow
(ref: tools/test.py:250-295, pairnet/datasets/psg.py:285-404): batched
jitted inference, mask upsampling to original resolution, conversion to the
eval protocol (1-based labels, rel_dists with bg column), then the recall
engine. Padded batch entries (trailing partial batch) are skipped via
``batch_valid``.
"""

from __future__ import annotations

import numpy as np

from pairnet_tpu.data.pipeline import Loader, PipelineConfig
from pairnet_tpu.evaluation.sgg_eval import (
    SGGroundTruth,
    SGPrediction,
    sgg_evaluate,
)


def _resize_logits(mask_logits: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(N, h, w) float -> (N, H, W) bilinear (PIL mode-F, matches
    F.interpolate(align_corners=False) closely)."""
    from PIL import Image

    H, W = out_hw
    out = np.empty((mask_logits.shape[0], H, W), np.float32)
    for i, m in enumerate(mask_logits):
        out[i] = np.asarray(
            Image.fromarray(m.astype(np.float32), mode="F").resize(
                (W, H), Image.BILINEAR
            )
        )
    return out


def predictions_to_protocol(
    out: dict, batch: dict, mask_stride: int, num_things: int = 80
) -> list[SGPrediction]:
    """Convert raw batched head outputs to per-image SGPredictions at
    original resolution."""
    preds = []
    B = out["rel"].shape[0]
    for b in range(B):
        if "batch_valid" in batch and not batch["batch_valid"][b]:
            continue
        rh, rw = (int(x) for x in batch["image_shape"][b])
        oh, ow = (int(x) for x in batch["orig_shape"][b])
        K, R = out["rel"][b].shape

        def softmax(x):
            e = np.exp(x - x.max(-1, keepdims=True))
            return e / e.sum(-1, keepdims=True)

        s_prob = softmax(np.asarray(out["sub"][b], np.float32))[:, :-1]
        o_prob = softmax(np.asarray(out["obj"][b], np.float32))[:, :-1]
        s_labels = s_prob.argmax(-1) + 1
        o_labels = o_prob.argmax(-1) + 1
        r_dists = softmax(np.asarray(out["rel"][b], np.float32))
        r_dists = np.concatenate([np.zeros((K, 1), np.float32), r_dists], -1)

        # crop the valid region of the stride-s logit map, upsample to orig
        ch = max(1, int(np.ceil(rh / mask_stride)))
        cw = max(1, int(np.ceil(rw / mask_stride)))
        s_seg = np.asarray(out["sub_seg"][b], np.float32)[:, :ch, :cw]
        o_seg = np.asarray(out["obj_seg"][b], np.float32)[:, :ch, :cw]
        s_masks = _resize_logits(s_seg, (oh, ow)) > 0.0  # sigmoid(x)>0.5 <=> x>0
        o_masks = _resize_logits(o_seg, (oh, ow)) > 0.0

        preds.append(
            SGPrediction(
                labels=np.concatenate([s_labels, o_labels]).astype(np.int64),
                rel_pair_idxes=np.stack(
                    [np.arange(K), np.arange(K) + K], axis=1
                ),
                rel_dists=r_dists,
                masks=np.concatenate([s_masks, o_masks]),
            )
        )
    return preds


def save_predictions(preds: list[SGPrediction], path: str) -> None:
    """Pickle per-image predictions (masks bit-packed) for vis_results.py
    (counterpart of the reference's results .pkl, ref: tools/vis_results.py)."""
    import pickle

    rows = []
    for p in preds:
        row = {
            "labels": p.labels,
            "rel_pair_idxes": p.rel_pair_idxes,
            "rel_dists": p.rel_dists.astype(np.float16),
            "boxes": p.boxes,
        }
        if p.masks is not None:
            row["mask_shape"] = p.masks.shape
            row["masks_packed"] = np.packbits(p.masks.astype(bool), axis=None)
        rows.append(row)
    with open(path, "wb") as f:
        pickle.dump(rows, f)


def load_predictions(path: str) -> list[SGPrediction]:
    import pickle

    with open(path, "rb") as f:
        rows = pickle.load(f)
    preds = []
    for row in rows:
        masks = None
        if "masks_packed" in row:
            shape = row["mask_shape"]
            n = int(np.prod(shape))
            masks = np.unpackbits(row["masks_packed"], count=n).astype(bool)
            masks = masks.reshape(shape)
        preds.append(
            SGPrediction(
                labels=row["labels"],
                rel_pair_idxes=row["rel_pair_idxes"],
                rel_dists=row["rel_dists"].astype(np.float32),
                masks=masks,
                boxes=row.get("boxes"),
            )
        )
    return preds


def load_groundtruths(dataset) -> list[SGGroundTruth]:
    """GT in eval protocol: 1-based labels, full-res masks
    (ref: psg.py:344-391)."""
    gts = []
    for i in range(len(dataset)):
        masks, labels, _ = dataset.load_masks(i)
        ann = dataset.get_ann_info(i)
        gts.append(
            SGGroundTruth(
                labels=np.asarray(
                    [m["category"] for m in ann["masks"]], np.int64
                )
                + 1,
                rels=np.asarray(ann["rels"], np.int64),
                masks=masks,
                boxes=ann["bboxes"],
            )
        )
    return gts


def evaluate_model(
    apply_fn,
    dataset,
    pipe_cfg: PipelineConfig,
    batch_size: int = 1,
    mode: str = "sgdet",
    num_predicates: int = 56,
    num_things: int = 80,
    iou_thr: float = 0.5,
    results_out: str | None = None,
) -> dict:
    """Run inference over ``dataset`` and return the metric dict.

    ``apply_fn(image_batch) -> output dict`` should be jitted by the caller.
    ``results_out`` pickles per-image predictions for tools/vis_results.py.
    """
    if mode == "predcls":
        # predcls substitutes GT detections for the prediction's, which only
        # lines up when the head is conditioned on GT boxes (two-stage path,
        # ref: predcls configs all use SceneGraphTwoStage); a one-stage head's
        # rel_pair_idxes index its own K queries, not the GT list.
        raise ValueError(
            "predcls is only defined for two-stage heads (use evaluate_twostage)"
        )
    loader = Loader(dataset, pipe_cfg, batch_size, train=False, seed=0)
    preds: list[SGPrediction] = []
    for batch in loader:
        out = apply_fn(batch["image"])
        out = {k: np.asarray(v) for k, v in out.items() if k != "queries"}
        preds.extend(
            predictions_to_protocol(out, batch, pipe_cfg.mask_stride, num_things)
        )
    if results_out:
        save_predictions(preds, results_out)
    gts = load_groundtruths(dataset)
    assert len(gts) == len(preds), (len(gts), len(preds))
    return sgg_evaluate(
        gts,
        preds,
        mode=mode,
        num_predicates=num_predicates,
        iou_thr=iou_thr,
        detection_method="pan_seg",
        num_things=num_things,
    )


def _canvas_resize(masks, ch, cw, oh, ow, canvas_hw):
    """Device crop+bilinear-resize into a fixed canvas (jit-stable shapes).

    masks (N, H4, W4) float; the valid content occupies [:ch, :cw]; it is
    bilinear-resized (align_corners=False, edge clamp — the crop-then-resize
    semantics of the host PIL path) to (oh, ow) and placed at the canvas
    origin, zeros elsewhere. ch/cw/oh/ow are traced scalars, so ONE compile
    covers every image size (VERDICT r2 #4: the per-mask host PIL loop was
    the eval wall-clock).
    """
    import jax
    import jax.numpy as jnp

    CH, CW = canvas_hw

    def axis(out_static, out_len, in_len):
        o = jnp.arange(out_static, dtype=jnp.float32)
        src = (o + 0.5) * (in_len / out_len) - 0.5
        i0 = jnp.floor(src)
        f = jnp.clip(src - i0, 0.0, 1.0)
        i0 = jnp.clip(i0.astype(jnp.int32), 0, in_len - 1)
        i1 = jnp.clip(i0 + 1, 0, in_len - 1)
        return i0, i1, f, (o < out_len)

    y0, y1, fy, ym = axis(CH, oh, ch)
    x0, x1, fx, xm = axis(CW, ow, cw)
    m = masks.astype(jnp.float32)
    rows = m[:, y0, :] * (1.0 - fy)[None, :, None] + m[:, y1, :] * fy[None, :, None]
    out = (
        rows[:, :, x0] * (1.0 - fx)[None, None, :]
        + rows[:, :, x1] * fx[None, None, :]
    )
    return out * ym[None, :, None] * xm[None, None, :]


def evaluate_model_device(
    apply_fn,
    dataset,
    pipe_cfg: PipelineConfig,
    batch_size: int = 1,
    mode: str = "sgdet",
    num_predicates: int = 56,
    num_things: int = 80,
    iou_thr: float = 0.5,
    topks: tuple = (20, 50, 100),
) -> dict:
    """Flagship sgdet evaluation with the WHOLE scored path on device:
    forward -> pairnet_postprocess (panoptic fusion + triplet ranking) ->
    canvas mask upsampling -> jit recall matching (device_eval_single).
    Counterpart of tools/test.py:250-295 + dataset.evaluate; the numpy
    engine (evaluate_model) remains the oracle (--eval-engine numpy).
    Returns the oracle's full sgdet key set: R@K, mR@K, thing/stuff
    4-group recall, phrdet (VERDICT r3 #6).
    """
    import jax
    import jax.numpy as jnp

    from pairnet_tpu.evaluation.device_eval import (
        SgdetAccumulator,
        device_eval_single,
    )
    from pairnet_tpu.models.heads.pairnet_inference import pairnet_postprocess

    if mode != "sgdet":
        raise ValueError("device engine currently scores sgdet only")

    # fixed canvas: max original resolution over the split (multiple of 8)
    CH = -(-max(d.height for d in dataset.data) // 8) * 8
    CW = -(-max(d.width for d in dataset.data) // 8) * 8

    post = jax.jit(
        lambda o, b: pairnet_postprocess(o, b, num_things=num_things),
        static_argnums=1,
    )
    resize = jax.jit(
        lambda m, ch, cw, oh, ow: _canvas_resize(m, ch, cw, oh, ow, (CH, CW))
    )
    match = jax.jit(
        lambda gl, gr, gm, pl, pp, pd, pm: device_eval_single(
            gl, gr, gm, pl, pp, pd, pm, iou_thr, topks, phrdet=True
        )
    )

    loader = Loader(dataset, pipe_cfg, batch_size, train=False, seed=0)
    gts = load_groundtruths(dataset)
    G_max = max(1, max(len(g.labels) for g in gts))
    R_max = max(1, max(len(g.rels) for g in gts))

    acc = SgdetAccumulator(num_predicates, num_things, topks)
    img_idx = 0
    for batch in loader:
        out = apply_fn(batch["image"])
        out = {
            k: v for k, v in out.items()
            if not isinstance(v, (list, tuple)) and k != "queries"
        }
        for b in range(batch["image"].shape[0]):
            if not batch["batch_valid"][b]:
                continue
            gt = gts[img_idx]
            img_idx += 1
            rh, rw = (int(x) for x in batch["image_shape"][b])
            oh, ow = (int(x) for x in batch["orig_shape"][b])
            ch = max(1, -(-rh // pipe_cfg.mask_stride))
            cw = max(1, -(-rw // pipe_cfg.mask_stride))
            trip = post(out, b)
            pm = resize(trip.masks, ch, cw, oh, ow) > 0.5

            # GT padded into the canvas + fixed instance/relation counts
            G = len(gt.labels)
            gmask = np.zeros((G_max, CH, CW), bool)
            gm = np.asarray(gt.masks, bool)
            gmask[:G, : gm.shape[1], : gm.shape[2]] = gm
            glabels = np.zeros((G_max,), np.int64)
            glabels[:G] = gt.labels
            grels = np.zeros((R_max, 3), np.int64)
            grels[: len(gt.rels)] = gt.rels

            matched, matched_phr, rel_valid = match(
                jnp.asarray(glabels), jnp.asarray(grels), jnp.asarray(gmask),
                trip.labels, trip.rel_pairs, trip.r_dists, pm,
            )
            acc.add(matched, matched_phr, rel_valid, grels, glabels)
    # multi-host: each process scored its disjoint shard; gather-reduce the
    # sufficient statistics (single-process: no-op)
    return acc.summarize(mode, gather=True)


def triplets_to_protocol(pred, batch, b, mask_stride: int) -> SGPrediction:
    """Convert a TripletPrediction (device) to the eval protocol at the
    original image resolution."""
    import jax

    rh, rw = (int(x) for x in batch["image_shape"][b])
    oh, ow = (int(x) for x in batch["orig_shape"][b])
    masks = np.asarray(pred.masks)
    ch = max(1, int(np.ceil(rh / mask_stride)))
    cw = max(1, int(np.ceil(rw / mask_stride)))
    m = masks[:, :ch, :cw].astype(np.float32)
    m_full = _resize_logits(m, (oh, ow)) > 0.5
    return SGPrediction(
        labels=np.asarray(pred.labels, np.int64),
        rel_pair_idxes=np.asarray(pred.rel_pairs, np.int64),
        rel_dists=np.asarray(pred.r_dists, np.float32),
        masks=m_full,
    )


def box_triplets_to_protocol(pred, batch, b) -> SGPrediction:
    """Convert a BoxTripletPrediction (normalized xyxy on the padded canvas)
    to original-resolution pixel boxes: the resized content occupies
    [0, rh) x [0, rw) of the padded canvas, so scale by padded size then by
    orig/resized."""
    rh, rw = (float(x) for x in batch["image_shape"][b])
    oh, ow = (float(x) for x in batch["orig_shape"][b])
    ph, pw = (float(s) for s in batch["image"].shape[1:3])
    boxes = np.asarray(pred.boxes, np.float32)
    sx = pw * ow / max(rw, 1.0)
    sy = ph * oh / max(rh, 1.0)
    boxes = boxes * np.array([sx, sy, sx, sy], np.float32)
    return SGPrediction(
        labels=np.asarray(pred.labels, np.int64),
        rel_pair_idxes=np.asarray(pred.rel_pairs, np.int64),
        rel_dists=np.asarray(pred.r_dists, np.float32),
        masks=None,
        boxes=boxes,
    )


def evaluate_model_with_postprocess(
    apply_fn,
    postprocess_fn,
    dataset,
    pipe_cfg: PipelineConfig,
    batch_size: int = 1,
    mode: str = "sgdet",
    num_predicates: int = 56,
    num_things: int = 80,
    iou_thr: float = 0.5,
    results_out: str | None = None,
) -> dict:
    """Like evaluate_model but through a head-specific TripletPrediction
    postprocessor (see train/dispatch.get_postprocess_fn). Box-mode heads
    (postprocess returns ``.boxes``, no masks) evaluate with
    detection_method='bbox' like the reference's VG/OIV6 path."""
    import jax

    if mode == "predcls":
        # predcls substitutes GT detections for the prediction's, which only
        # lines up when the head is conditioned on GT boxes (two-stage path,
        # ref: predcls configs all use SceneGraphTwoStage); a one-stage head's
        # rel_pair_idxes index its own K queries, not the GT list.
        raise ValueError(
            "predcls is only defined for two-stage heads (use evaluate_twostage)"
        )
    loader = Loader(dataset, pipe_cfg, batch_size, train=False, seed=0)
    post = jax.jit(lambda o, b: postprocess_fn(o, b, num_things=num_things),
                   static_argnums=1)
    preds: list[SGPrediction] = []
    use_boxes = False
    for batch in loader:
        out = apply_fn(batch["image"])
        out = {k: v for k, v in out.items()
               if not isinstance(v, (list, tuple)) and k != "queries"}
        for b in range(batch["image"].shape[0]):
            if not batch["batch_valid"][b]:
                continue
            trip = post(out, b)
            if hasattr(trip, "boxes"):
                use_boxes = True
                preds.append(box_triplets_to_protocol(trip, batch, b))
            else:
                preds.append(
                    triplets_to_protocol(trip, batch, b, pipe_cfg.mask_stride)
                )
    if results_out:
        save_predictions(preds, results_out)
    gts = load_groundtruths(dataset)
    assert len(gts) == len(preds)
    return sgg_evaluate(
        gts, preds, mode=mode, num_predicates=num_predicates,
        iou_thr=iou_thr,
        detection_method="bbox" if use_boxes else "pan_seg",
        num_things=num_things,
    )


def evaluate_pq(
    apply_fn,
    postprocess_fn,
    dataset,
    pipe_cfg: PipelineConfig,
    batch_size: int = 1,
    num_classes: int = 133,
    num_things: int = 80,
) -> dict:
    """Panoptic Quality over a split (counterpart of the reference's
    ``--eval PQ`` flow, ref: pairnet/datasets/psg.py:285-335 +
    tools/test.py:277-295, which delegates to mmdet CocoPanopticDataset /
    panopticapi).

    Works for any head whose postprocessor returns a ``pan_seg`` id map
    (``m_id * INSTANCE_OFFSET + label``): PairNetHead, BaselineHead,
    detr4seg, PSGTr*. The device map lives on the stride-``mask_stride``
    padded canvas; the valid region is nearest-upsampled to the original
    resolution before matching (the reference fuses at full resolution
    after interpolating per-query logits — at IoU>0.5 matching the
    nearest-vs-logit-interp boundary delta is sub-pixel in practice).
    """
    import jax

    from pairnet_tpu.evaluation.panoptic_quality import (
        pan_seg_to_ids,
        pq_compute,
    )

    loader = Loader(dataset, pipe_cfg, batch_size, train=False, seed=0)
    post = jax.jit(
        lambda o, b: postprocess_fn(o, b, num_things=num_things),
        static_argnums=1,
    )
    images = []
    idx = 0
    for batch in loader:
        out = apply_fn(batch["image"])
        out = {k: v for k, v in out.items()
               if not isinstance(v, (list, tuple)) and k != "queries"}
        for b in range(batch["image"].shape[0]):
            if not batch["batch_valid"][b]:
                continue
            trip = post(out, b)
            if not hasattr(trip, "pan_seg"):
                raise ValueError(
                    "PQ needs a panoptic postprocessor (head returned no "
                    "pan_seg; box-only heads cannot be PQ-scored)"
                )
            rh, rw = (int(x) for x in batch["image_shape"][b])
            oh, ow = (int(x) for x in batch["orig_shape"][b])
            s = pipe_cfg.mask_stride
            ch = max(1, int(np.ceil(rh / s)))
            cw = max(1, int(np.ceil(rw / s)))
            pan = np.asarray(trip.pan_seg)[:ch, :cw]
            # nearest upsample of the id map to original resolution
            yi = np.minimum((np.arange(oh) * ch) // oh, ch - 1)
            xi = np.minimum((np.arange(ow) * cw) // ow, cw - 1)
            pan_full = pan[yi][:, xi]
            pred_ids, pred_map = pan_seg_to_ids(pan_full)
            # ids fused from no-detection fill (label >= num_classes) are VOID
            pred_map = {
                i: l for i, l in pred_map.items() if l < num_classes
            }
            valid = np.isin(pred_ids, list(pred_map)) if pred_map else np.zeros(
                pred_ids.shape, bool
            )
            pred_ids = np.where(valid, pred_ids, -1)
            gt_ids, gt_map = dataset.load_pan_ids(idx)
            images.append((gt_ids, gt_map, pred_ids, pred_map))
            idx += 1
    assert idx == len(dataset), (idx, len(dataset))
    pq = pq_compute(images, num_classes=num_classes, num_things=num_things)
    metrics = {}
    for group, vals in pq.items():
        for k in ("PQ", "SQ", "RQ"):
            metrics[f"{group}_{k}"] = round(float(vals[k]), 4)
        metrics[f"{group}_n"] = vals["n"]
    return metrics


def evaluate_twostage(
    apply_fn,
    dataset,
    pipe_cfg: PipelineConfig,
    max_pairs: int | None = None,
    batch_size: int = 1,
    mode: str = "predcls",
    num_predicates: int = 56,
    num_things: int = 80,
    iou_thr: float = 0.5,
    detector_apply=None,
    eval_engine: str = "numpy",
) -> dict:
    """predcls/sgcls/sgdet evaluation for the two-stage relation heads.

    predcls/sgcls: detections are the GT boxes (ref: sg_panoptic_fpn.py:
    383-391). sgdet: ``detector_apply(image, image_shape) ->
    (boxes, labels_1based, valid, mask_logits_h4w4)`` provides them (the
    reference runs the frozen PanopticFPN detector, sg_panoptic_fpn.py:
    57-142). All ordered pairs are scored and ranked by the PostProcessor
    triplet score. ``apply_fn(batch) -> outputs`` must accept the two-stage
    batch contract.

    ``eval_engine="device"`` (predcls/sgcls only) scores the collected
    predictions with the jit matcher (device_eval_twostage_single) instead
    of the per-image numpy oracle — same key set incl. the SGPairAccuracy /
    SGObjectIOU twins, parity-tested in tests/test_device_eval.py.
    """
    from pairnet_tpu.data.pipeline import to_twostage_batch
    from pairnet_tpu.models.heads.twostage.core import all_test_pairs
    from pairnet_tpu.models.heads.twostage.heads import twostage_postprocess

    if max_pairs is None:
        # test time scores ALL ordered pairs (ref: sampling.py:44-67);
        # truncating silently destroys recall
        max_pairs = pipe_cfg.max_inst * (pipe_cfg.max_inst - 1)
    if mode == "sgdet" and detector_apply is None:
        raise ValueError("sgdet needs detector_apply (frozen detector)")
    transform = None
    if mode != "sgdet":
        transform = lambda s, rng: to_twostage_batch(
            s, max_pairs, train=False, rng=rng
        )
    loader = Loader(
        dataset, pipe_cfg, batch_size, train=False, seed=0,
        sample_transform=transform,
    )
    gts = load_groundtruths(dataset)
    preds: list[SGPrediction] = []
    for batch in loader:
        det_masks = None
        if mode == "sgdet":
            boxes, labels, dists, valid, det_masks = (
                np.asarray(t)
                for t in detector_apply(batch["image"], batch["image_shape"])
            )
            B, G = labels.shape
            pairs = np.zeros((B, max_pairs, 2), np.int64)
            pvalid = np.zeros((B, max_pairs), bool)
            for b in range(B):
                p, v = all_test_pairs(int(valid[b].sum()), G)
                pairs[b] = p[:max_pairs]
                pvalid[b] = v[:max_pairs]
            batch = dict(
                batch,
                det_boxes=boxes.astype(np.float32),
                det_labels=labels.astype(np.int32),
                det_dists=dists.astype(np.float32),
                det_valid=valid,
                pairs=pairs,
                pair_valid=pvalid,
                pair_labels=np.zeros((B, max_pairs), np.int32),
            )
        out = apply_fn(batch)
        out = {k: np.asarray(v) for k, v in out.items()}
        for b in range(batch["image"].shape[0]):
            if not batch["batch_valid"][b]:
                continue
            res = twostage_postprocess(out, batch, b)
            masks = None
            if det_masks is not None:
                rh, rw = (int(x) for x in batch["image_shape"][b])
                oh, ow = (int(x) for x in batch["orig_shape"][b])
                ch = max(1, int(np.ceil(rh / pipe_cfg.mask_stride)))
                cw = max(1, int(np.ceil(rw / pipe_cfg.mask_stride)))
                m = det_masks[b][:, :ch, :cw].astype(np.float32)
                masks = _resize_logits(m, (oh, ow)) > 0.0
            preds.append(
                SGPrediction(
                    labels=res["labels"].astype(np.int64),
                    rel_pair_idxes=res["rel_pair_idxes"].astype(np.int64),
                    rel_dists=res["rel_dists"].astype(np.float32),
                    obj_scores=res["obj_scores"],
                    masks=masks,
                )
            )
    assert len(gts) == len(preds)
    if mode != "sgdet":
        # predcls/sgcls ground in the GT objects: the prediction's regions
        # ARE the GT masks (ref sg_panoptic_fpn.py:383-391 passes the GT
        # proposals through); predcls additionally substitutes GT labels
        from dataclasses import replace as _dc_replace

        preds = [
            _dc_replace(
                p,
                masks=gt.masks,
                labels=gt.labels if mode == "predcls" else p.labels,
            )
            for p, gt in zip(preds, gts)
        ]
    if eval_engine == "device":
        if mode == "sgdet":
            raise ValueError(
                "device engine for two-stage sgdet: use evaluate_model_device"
            )
        return _twostage_device_metrics(
            gts, preds, mode, num_predicates, num_things, iou_thr
        )
    out = sgg_evaluate(
        gts, preds, mode=mode, num_predicates=num_predicates,
        iou_thr=iou_thr, detection_method="pan_seg", num_things=num_things,
    )
    if mode != "sgdet":
        # SGPairAccuracy / SGObjectIOU run for the GT-grounded protocols
        # (ref sgg_metrics.py:537-667, 942-1086)
        from pairnet_tpu.evaluation.sgg_eval import (
            sg_object_iou,
            sg_pair_accuracy,
        )

        out.update(
            sg_pair_accuracy(gts, preds, num_things=num_things,
                             iou_thr=iou_thr)
        )
        out.update(sg_object_iou(gts, preds, iou_thr=iou_thr))
    return out


def _twostage_device_metrics(
    gts, preds, mode, num_predicates, num_things, iou_thr,
    topks=(20, 50, 100),
):
    """Jit-matcher scoring of GT-grounded predcls/sgcls predictions."""
    import jax.numpy as jnp

    from pairnet_tpu.evaluation.device_eval import (
        SgdetAccumulator,
        device_eval_twostage_single,
    )

    acc = SgdetAccumulator(num_predicates, num_things, topks, twostage=True)
    for gt, pred in zip(gts, preds):
        if len(gt.rels) == 0:
            continue
        matched, matched_pair, rel_valid, best_sub, best_obj, has_cand = (
            device_eval_twostage_single(
                jnp.asarray(gt.labels),
                jnp.asarray(gt.rels),
                jnp.asarray(gt.masks),
                jnp.asarray(pred.labels),
                jnp.asarray(pred.rel_pair_idxes),
                jnp.asarray(pred.rel_dists),
                jnp.asarray(pred.masks),
                iou_thr,
                topks,
            )
        )
        acc.add(matched, None, rel_valid, gt.rels, gt.labels)
        acc.add_twostage(
            matched_pair, best_sub, best_obj, has_cand, rel_valid, iou_thr
        )
    return acc.summarize(mode)
