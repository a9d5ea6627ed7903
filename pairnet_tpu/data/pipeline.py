"""Host-side preprocessing pipeline -> fixed-shape device batches.

Counterpart of the reference's mmdet pipeline
(ref: configs/mask2former/pairnet.py:234-331): keep-ratio resize (multi-scale
short side in train, (1333, 800) in test), random horizontal flip, ImageNet
normalization, padding — but re-designed for XLA: every output has a static
shape. Images land in a single padded canvas (bucketing handled by choosing
``target_size``); GT instances pad to ``max_inst``; relations pad to
``max_rels``; masks are stored at ``mask_stride`` (the reference downsamples
GT masks 2x in PSGTr.forward_train, ref: frameworks/psgtr.py:124-141 — here
the stride is a config knob and defaults to 4 to match the prediction
resolution).

Batch contract (see models/heads/pairnet_loss.py):
  image       (B, H, W, 3) f32 normalized
  gt_labels   (B, G) int32        gt_valid (B, G) bool
  gt_masks    (B, G, H/s, W/s) bool (consumers upcast on device)
  gt_rels     (B, R, 3) int32 [sub, obj, predicate_1based]
  rel_valid   (B, R) bool
  image_shape (B, 2) int32  (unpadded h, w after resize)
  orig_shape  (B, 2) int32  (original image h, w)
"""

from __future__ import annotations

from dataclasses import dataclass, field

import os

import numpy as np

IMAGENET_MEAN = np.asarray([123.675, 116.28, 103.53], np.float32)
IMAGENET_STD = np.asarray([58.395, 57.12, 57.375], np.float32)


@dataclass
class PipelineConfig:
    target_size: tuple[int, int] = (800, 1333)  # (short, long) keep-ratio cap
    pad_size: tuple[int, int] | None = None  # (H, W) padded canvas; derived if None
    size_divisor: int = 32
    mask_stride: int = 4
    max_inst: int = 64
    max_rels: int = 100
    flip_prob: float = 0.5
    train_scales: tuple[int, ...] = ()  # optional multi-scale short sides
    # AutoAugment crop branch (ref: configs/mask2former/pairnet.py:234-306):
    # with prob crop_prob, resize to a random crop_scales short side, apply
    # RelRandomCrop with crop size sampled in crop_size_range (absolute
    # range), then continue through the standard multi-scale resize
    crop_prob: float = 0.0
    crop_scales: tuple[int, ...] = (400, 500, 600)
    crop_size_range: tuple[int, int] = (384, 600)
    mean: np.ndarray = field(default_factory=lambda: IMAGENET_MEAN)
    std: np.ndarray = field(default_factory=lambda: IMAGENET_STD)

    def padded_hw(self) -> tuple[int, int]:
        if self.pad_size is not None:
            return self.pad_size
        short, long = self.target_size
        d = self.size_divisor
        pad = lambda v: ((v + d - 1) // d) * d
        return pad(short), pad(long)


def _resize_image(img: np.ndarray, scale: float) -> np.ndarray:
    h, w = img.shape[:2]
    nh, nw = max(1, int(round(h * scale))), max(1, int(round(w * scale)))
    from pairnet_tpu import native

    if native.available():
        # native bilinear matches mmcv/cv2 (no antialias) — the reference's
        # resize semantics; PIL antialiases on downscale
        return native.resize_bilinear(img, nh, nw)
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), np.uint8
    )


def _resize_masks_nearest(masks: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """(N, H, W) bool -> (N, nh, nw) bool via nearest-neighbor index mapping."""
    n, h, w = masks.shape
    nh, nw = out_hw
    if n == 0:
        return np.zeros((0, nh, nw), bool)
    ys = np.minimum((np.arange(nh) + 0.5) * h / nh, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(nw) + 0.5) * w / nw, w - 1).astype(np.int64)
    return masks[:, ys[:, None], xs[None, :]]


def keep_ratio_scale(h: int, w: int, short: int, long: int) -> float:
    """mmdet keep-ratio rescale factor for target (long, short)."""
    return min(long / max(h, w), short / min(h, w))


def preprocess_sample(
    dataset,
    idx: int,
    cfg: PipelineConfig,
    train: bool,
    rng: np.random.Generator | None = None,
) -> dict:
    """One image -> fixed-shape numpy sample dict."""
    rng = rng or np.random.default_rng()
    img = dataset.load_image(idx)
    masks, mask_labels, _ = dataset.load_masks(idx)
    ann = dataset.get_ann_info(idx)
    rels = ann["rels"]  # (R, 3) predicate 1-based
    labels = np.asarray(
        [m["category"] for m in ann["masks"]], np.int64
    )  # per-segment class (things + stuff), aligned with masks

    short, long = cfg.target_size
    orig_h, orig_w = img.shape[:2]
    if train and cfg.crop_prob and rng.random() < cfg.crop_prob:
        # AutoAugment branch 2: resize -> RelRandomCrop -> resize (ref:
        # configs/mask2former/pairnet.py:266-297). When no triplet survives
        # the crop, mmdet skips the sample and the loader retries; our
        # fixed-shape loader instead falls back to the plain resize branch.
        short0 = int(rng.choice(cfg.crop_scales))
        scale0 = keep_ratio_scale(orig_h, orig_w, short0, long)
        img0 = _resize_image(img, scale0)
        m0 = _resize_masks_nearest(masks, img0.shape[:2])
        cmin, cmax = cfg.crop_size_range
        h0, w0 = img0.shape[:2]
        ch = int(rng.integers(min(cmin, h0), min(cmax, h0) + 1))
        cw = int(rng.integers(min(cmin, w0), min(cmax, w0) + 1))
        cropped = rel_random_crop(img0, m0, labels, rels, (ch, cw), rng)
        if cropped is not None:
            img, masks, labels, rels = cropped
    if train and cfg.train_scales:
        short = int(rng.choice(cfg.train_scales))
    scale = keep_ratio_scale(img.shape[0], img.shape[1], short, long)
    img_r = _resize_image(img, scale)
    rh, rw = img_r.shape[:2]

    if train and rng.random() < cfg.flip_prob:
        img_r = img_r[:, ::-1]
        masks = masks[:, :, ::-1]

    pad_h, pad_w = cfg.padded_hw()
    rh, rw = min(rh, pad_h), min(rw, pad_w)
    from pairnet_tpu import native

    if native.available() and img_r.dtype == np.uint8:
        # single-pass fused normalize+pad (C++/OpenMP): ~3x the numpy
        # subtract/divide/copy chain on large canvases
        canvas = native.normalize_pad(
            np.ascontiguousarray(img_r[:rh, :rw]), cfg.mean, cfg.std,
            pad_h, pad_w,
        )
    else:
        canvas = np.zeros((pad_h, pad_w, 3), np.float32)
        canvas[:rh, :rw] = (img_r[:rh, :rw].astype(np.float32) - cfg.mean) / cfg.std

    s = cfg.mask_stride
    mh, mw = pad_h // s, pad_w // s
    # resize masks to the resized-image geometry, then place on the canvas
    m_small = _resize_masks_nearest(masks, (max(1, rh // s), max(1, rw // s)))
    G = cfg.max_inst
    # bool canvases: at max_inst=64 and 800x1344 the f32 version was 68 MB
    # per sample — 4x the host-side alloc/copy and 4x the host->device
    # transfer for identical information; consumers upcast on device
    gt_masks = np.zeros((G, mh, mw), bool)
    gt_labels = np.zeros((G,), np.int32)
    gt_valid = np.zeros((G,), bool)
    n = min(len(masks), G)
    gt_masks[:n, : m_small.shape[1], : m_small.shape[2]] = m_small[:n]
    gt_labels[:n] = labels[:n]
    gt_valid[:n] = True

    # boxes in resized-image pixels, derived from the (stride-s) masks
    gt_boxes = np.zeros((G, 4), np.float32)
    for i in range(n):
        ys, xs = np.nonzero(gt_masks[i])
        if len(ys):
            gt_boxes[i] = [xs.min() * s, ys.min() * s, (xs.max() + 1) * s, (ys.max() + 1) * s]

    R = cfg.max_rels
    gt_rels = np.zeros((R, 3), np.int32)
    rel_valid = np.zeros((R,), bool)
    # drop relations whose endpoints were truncated away by max_inst
    ok = (rels[:, 0] < n) & (rels[:, 1] < n) if len(rels) else np.zeros(0, bool)
    rels = rels[ok][:R]
    gt_rels[: len(rels)] = rels
    rel_valid[: len(rels)] = True

    return {
        "image": canvas,
        "gt_labels": gt_labels,
        "gt_boxes": gt_boxes,
        "gt_masks": gt_masks,
        "gt_valid": gt_valid,
        "gt_rels": gt_rels,
        "rel_valid": rel_valid,
        "image_shape": np.asarray([rh, rw], np.int32),
        "orig_shape": np.asarray([orig_h, orig_w], np.int32),
    }


def collate(samples: list[dict]) -> dict:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class Loader:
    """Minimal epoch loader: shuffle, preprocess, collate to fixed shapes.

    The reference uses torch DataLoader workers (ref: SURVEY.md §3.1); a
    threaded prefetcher can wrap this without changing the contract.
    """

    def __init__(
        self,
        dataset,
        cfg: PipelineConfig,
        batch_size: int,
        train: bool,
        seed: int = 0,
        drop_last: bool | None = None,
        sample_transform=None,
        num_workers: int | None = None,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.drop_last = train if drop_last is None else drop_last
        # per-sample hook (e.g. to_twostage_batch for relation-pair fields)
        self.sample_transform = sample_transform
        # async decode/preprocess: the reference runs 2 dataloader workers
        # per GPU (ref: configs/mask2former/pairnet.py workers_per_gpu=2);
        # here a thread pool (PIL/numpy/native C++ release the GIL) plus a
        # `prefetch`-deep pipeline of ready batches
        if num_workers is None:
            num_workers = int(os.environ.get("PAIRNET_LOADER_WORKERS", "4"))
        self.num_workers = num_workers
        self.prefetch = prefetch

    def __len__(self) -> int:
        n = len(self.dataset)
        b = self.batch_size
        return n // b if self.drop_last else (n + b - 1) // b

    def _make_sample(self, i: int, pos: int) -> dict:
        # per-sample counter-based rng: deterministic regardless of worker
        # scheduling (the sync path uses one sequential stream instead)
        rng = np.random.default_rng([self.seed, pos])
        s = preprocess_sample(self.dataset, i, self.cfg, self.train, rng)
        if self.sample_transform is not None:
            s = self.sample_transform(s, rng)
        return s

    def _batch_starts(self, order):
        b = self.batch_size
        end = len(order) - (len(order) % b) if self.drop_last else len(order)
        return [(start, order[start : start + b]) for start in range(0, end, b)]

    def _finalize(self, samples, n_real):
        b = self.batch_size
        samples = list(samples)
        while len(samples) < b:  # pad trailing partial batch
            samples.append(samples[0])
        batch = collate(samples)
        batch["batch_valid"] = np.arange(b) < n_real
        return batch

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.train:
            self.rng.shuffle(order)
        plan = self._batch_starts(order)
        if self.num_workers <= 0:
            for start, idxs in plan:
                samples = [
                    preprocess_sample(
                        self.dataset, int(i), self.cfg, self.train, self.rng
                    )
                    for i in idxs
                ]
                if self.sample_transform is not None:
                    samples = [self.sample_transform(s, self.rng) for s in samples]
                yield self._finalize(samples, len(idxs))
            return

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            pending = []

            def submit(start, idxs):
                futs = [
                    pool.submit(self._make_sample, int(i), start + k)
                    for k, i in enumerate(idxs)
                ]
                pending.append((futs, len(idxs)))

            depth = max(1, self.prefetch)
            for start, idxs in plan[:depth]:
                submit(start, idxs)
            nxt = depth
            while pending:
                futs, n_real = pending.pop(0)
                samples = [f.result() for f in futs]
                if nxt < len(plan):
                    submit(*plan[nxt])
                    nxt += 1
                yield self._finalize(samples, n_real)


def to_twostage_batch(
    sample: dict,
    max_pairs: int,
    train: bool,
    rng: np.random.Generator | None = None,
    relation_map: np.ndarray | None = None,
) -> dict:
    """Augment a preprocessed sample with two-stage relation-head fields.

    predcls/sgcls: detections are the GT boxes; labels become 1-based
    (0 = background). Pair sampling follows the reference's RelationSampler
    (see models/heads/twostage/core.py).
    """
    from pairnet_tpu.models.heads.twostage.core import (
        all_test_pairs,
        sample_train_pairs,
    )

    rng = rng or np.random.default_rng()
    n_valid = int(sample["gt_valid"].sum())
    G = sample["gt_valid"].shape[0]
    out = dict(sample)
    out["det_boxes"] = sample["gt_boxes"]
    out["det_labels"] = np.where(
        sample["gt_valid"], sample["gt_labels"] + 1, 0
    ).astype(np.int32)
    out["det_valid"] = sample["gt_valid"]

    if relation_map is None:
        relation_map = np.zeros((G, G), np.int64)
        rels = sample["gt_rels"][sample["rel_valid"]]
        for s, o, p in rels:
            relation_map[s, o] = p

    if train:
        pairs, labels, valid = sample_train_pairs(
            relation_map, n_valid, max_pairs, rng=rng
        )
    else:
        pairs, valid = all_test_pairs(n_valid, G)
        pairs = pairs[:max_pairs]
        valid = valid[:max_pairs]
        labels = relation_map[pairs[:, 0], pairs[:, 1]].astype(np.int32)
    out["pairs"] = pairs
    out["pair_labels"] = labels.astype(np.int32)
    out["pair_valid"] = valid
    return out


def rel_random_crop(
    img: np.ndarray,
    masks: np.ndarray,
    labels: np.ndarray,
    rels: np.ndarray,
    crop_hw: tuple[int, int],
    rng: np.random.Generator,
):
    """Relation-aware random crop (ref: pairnet/datasets/pipelines/
    rel_randomcrop.py:30-89): crop the image, drop instances whose mask
    vanishes, RE-INDEX surviving relations by the prefix sum of kept
    instances, and return None (skip sample) if no triplet survives.

    img (H, W, 3) uint8; masks (N, H, W) bool; rels (R, 3) predicate 1-based.
    """
    ch, cw = crop_hw
    H, W = img.shape[:2]
    off_y = int(rng.integers(0, max(H - ch, 0) + 1))
    off_x = int(rng.integers(0, max(W - cw, 0) + 1))
    img_c = img[off_y : off_y + ch, off_x : off_x + cw]
    masks_c = masks[:, off_y : off_y + ch, off_x : off_x + cw]

    valid = masks_c.any(axis=(1, 2))
    new_index = np.cumsum(valid) - 1  # prefix-sum re-indexing
    rels_left = [
        [int(new_index[s]), int(new_index[o]), int(p)]
        for s, o, p in rels
        if valid[s] and valid[o]
    ]
    if not rels_left:
        return None
    return (
        img_c,
        masks_c[valid],
        labels[valid],
        np.asarray(rels_left, np.int32),
    )
