"""PSG (Panoptic Scene Graph) dataset reader.

Behavioral counterpart of ``PanopticSceneGraphDataset``
(ref: pairnet/datasets/psg.py:18-283):

* single ``psg.json`` with keys ``data``, ``test_image_ids``,
  ``thing_classes``, ``stuff_classes``, ``predicate_classes``,
* predicates are 1-indexed on load (ref: psg.py:73-74),
* images with zero relations are dropped (ref: psg.py:77),
* train/test split membership by ``test_image_ids`` (ref: psg.py:80-90),
* relation dedup: train keeps one random predicate per (sub, obj) pair;
  test keeps unique triplets (multi-label per pair)
  (ref: psg.py:230-245),
* NxN relation map with random keep on collision (ref: psg.py:248-260),
* predicate frequency statistics for FrequencyBias
  (ref: psg.py:406-442).

Panoptic PNG decoding (panopticapi ``rgb2id``) is a vectorized numpy op:
``id = r + 256*g + 65536*b``. Per-segment binary masks are emitted for
things AND stuff (ref: pairnet/datasets/pipelines/loading.py:110-158).
"""

from __future__ import annotations

import json
import os.path as osp
from collections import defaultdict
from dataclasses import dataclass, field

import numpy as np

from pairnet_tpu.config.registry import DATASETS


def rgb2id(color: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) int32 panoptic segment ids."""
    color = color.astype(np.int64)
    return (color[..., 0] + 256 * color[..., 1] + 65536 * color[..., 2]).astype(
        np.int64
    )


def id2rgb(ids: np.ndarray) -> np.ndarray:
    """(H, W) int -> (H, W, 3) uint8 (inverse of rgb2id)."""
    ids = ids.astype(np.int64)
    return np.stack(
        [ids % 256, (ids // 256) % 256, (ids // 65536) % 256], axis=-1
    ).astype(np.uint8)


@dataclass
class PSGItem:
    image_id: str
    file_name: str
    pan_seg_file_name: str
    height: int
    width: int
    segments_info: list  # [{id, category_id, isthing, ...}]
    annotations: list  # [{bbox, category_id, ...}] aligned with segments_info
    relations: np.ndarray  # (R, 3) [sub_idx, obj_idx, predicate_1based]


@DATASETS.register()
class PSGDataset:
    def __init__(
        self,
        ann_file: str,
        data_root: str | None = None,
        img_prefix: str = "",
        seg_prefix: str | None = None,
        split: str = "train",
        test_mode: bool = False,
        all_bboxes: bool = True,
        seed: int = 10086,
    ):
        assert split in {"train", "test"}
        self.split = split
        self.test_mode = test_mode
        self.all_bboxes = all_bboxes
        self.img_prefix = img_prefix
        self.seg_prefix = seg_prefix if seg_prefix is not None else img_prefix
        if data_root is not None:
            if not osp.isabs(ann_file):
                ann_file = osp.join(data_root, ann_file)
            if not osp.isabs(self.img_prefix):
                self.img_prefix = osp.join(data_root, self.img_prefix)
            if not osp.isabs(self.seg_prefix):
                self.seg_prefix = osp.join(data_root, self.seg_prefix)
        self._rng = np.random.default_rng(seed)

        with open(ann_file) as f:
            dataset = json.load(f)

        test_ids = set(dataset["test_image_ids"])
        self.THING_CLASSES = dataset["thing_classes"]
        self.STUFF_CLASSES = dataset["stuff_classes"]
        self.CLASSES = self.THING_CLASSES + self.STUFF_CLASSES
        self.PREDICATES = dataset["predicate_classes"]

        self.data: list[PSGItem] = []
        for d in dataset["data"]:
            rels = [[r[0], r[1], r[2] + 1] for r in d["relations"]]  # 1-index
            if len(rels) == 0:
                continue  # drop relation-less images
            in_test = d["image_id"] in test_ids
            if (split == "train") == in_test:
                continue
            self.data.append(
                PSGItem(
                    image_id=d["image_id"],
                    file_name=d["file_name"],
                    pan_seg_file_name=d.get("pan_seg_file_name", ""),
                    height=d["height"],
                    width=d["width"],
                    segments_info=d.get("segments_info", []),
                    annotations=d.get("annotations", []),
                    relations=np.asarray(rels, dtype=np.int32),
                )
            )

    def __len__(self) -> int:
        return len(self.data)

    # -- annotations -------------------------------------------------------
    def get_ann_info(self, idx: int) -> dict:
        d = self.data[idx]
        if self.all_bboxes:
            if d.annotations:
                gt_bboxes = np.asarray(
                    [a["bbox"] for a in d.annotations], np.float32
                )
                gt_labels = np.asarray(
                    [a["category_id"] for a in d.annotations], np.int64
                )
            else:
                gt_bboxes = np.zeros((0, 4), np.float32)
                gt_labels = np.zeros((0,), np.int64)
        else:
            things = [
                (a["bbox"], a["category_id"])
                for a, s in zip(d.annotations, d.segments_info)
                if s["isthing"]
            ]
            gt_bboxes = (
                np.asarray([t[0] for t in things], np.float32)
                if things
                else np.zeros((0, 4), np.float32)
            )
            gt_labels = np.asarray([t[1] for t in things], np.int64)

        gt_rels = self._dedup_relations(d.relations)

        # box-only datasets have no segments_info; index by annotations
        num_seg = len(d.segments_info) or len(d.annotations)
        relation_map = np.zeros((num_seg, num_seg), np.int64)
        for s, o, p in gt_rels:
            if relation_map[s, o] > 0:
                if self._rng.random() > 0.5:
                    relation_map[s, o] = p
            else:
                relation_map[s, o] = p

        return dict(
            bboxes=gt_bboxes,
            labels=gt_labels,
            rels=gt_rels,
            rel_maps=relation_map,
            masks=[
                {"id": s["id"], "category": s["category_id"], "is_thing": s["isthing"]}
                for s in d.segments_info
            ]
            or [
                # box-only datasets: one pseudo-segment per annotation
                {"id": i, "category": a["category_id"], "is_thing": True}
                for i, a in enumerate(d.annotations)
            ],
            seg_map=d.pan_seg_file_name,
        )

    def _dedup_relations(self, rels: np.ndarray) -> np.ndarray:
        if self.split == "train":
            pair_sets = defaultdict(list)
            for s, o, p in rels:
                pair_sets[(int(s), int(o))].append(int(p))
            out = [
                (s, o, int(self._rng.choice(ps))) for (s, o), ps in pair_sets.items()
            ]
            return np.asarray(out, np.int32)
        seen: list[tuple] = []
        for s, o, p in rels:
            t = (int(s), int(o), int(p))
            if t not in seen:
                seen.append(t)
        return np.asarray(seen, np.int32)

    # -- image / mask loading ----------------------------------------------
    def load_image(self, idx: int) -> np.ndarray:
        from PIL import Image

        d = self.data[idx]
        img = Image.open(osp.join(self.img_prefix, d.file_name)).convert("RGB")
        return np.asarray(img, np.uint8)

    def load_masks(self, idx: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the panoptic PNG -> (masks (N, H, W) bool, labels (N,), semantic (H, W)).

        One binary mask per segment (things and stuff); semantic map uses 255
        as ignore (ref: loading.py:110-158).
        """
        from PIL import Image

        d = self.data[idx]
        pan = np.asarray(
            Image.open(osp.join(self.seg_prefix, d.pan_seg_file_name)).convert("RGB")
        )
        seg_ids = rgb2id(pan)
        masks = []
        labels = []
        semantic = np.full(seg_ids.shape, 255, np.uint8)
        for s in d.segments_info:
            m = seg_ids == s["id"]
            masks.append(m)
            labels.append(s["category_id"])
            semantic[m] = s["category_id"]
        if masks:
            return np.stack(masks), np.asarray(labels, np.int64), semantic
        h, w = seg_ids.shape
        return np.zeros((0, h, w), bool), np.zeros((0,), np.int64), semantic

    def load_pan_ids(self, idx: int) -> tuple[np.ndarray, dict]:
        """Decode the panoptic PNG -> (seg_ids (H, W) int64, id->label map).

        Pixels whose id is not in segments_info (e.g. the 0 background of
        unlabeled regions) are VOID for PQ purposes (ref: psg.py:320-335
        delegates to panopticapi, which treats id 0 as VOID).
        """
        from PIL import Image

        d = self.data[idx]
        pan = np.asarray(
            Image.open(osp.join(self.seg_prefix, d.pan_seg_file_name)).convert("RGB")
        )
        seg_ids = rgb2id(pan).astype(np.int64)
        id2label = {int(s["id"]): int(s["category_id"]) for s in d.segments_info}
        labeled = np.isin(seg_ids, list(id2label))
        seg_ids = np.where(labeled, seg_ids, -1)
        return seg_ids, id2label

    # -- statistics ----------------------------------------------------------
    def get_freq_matrix(self) -> np.ndarray:
        n_obj = len(self.CLASSES)
        n_rel = len(self.PREDICATES)
        freq = np.zeros((n_obj, n_obj, n_rel + 1), np.float64)
        for d in self.data:
            segs = d.segments_info
            for rel in d.relations:
                # NOTE: the reference indexes [rel0_class, rel1_class] in
                # (object, subject) order (ref: psg.py:429-436); preserved.
                freq[
                    segs[rel[0]]["category_id"],
                    segs[rel[1]]["category_id"],
                    rel[2],
                ] += 1
        return freq

    def get_statistics(self) -> dict:
        freq = self.get_freq_matrix()
        eps = 1e-3
        freq = freq + eps
        pred_dist = np.log(freq / freq.sum(2)[:, :, None] + eps)
        return {
            "freq_matrix": freq,
            "pred_dist": pred_dist.astype(np.float32),
        }
