"""Box-only scene graph datasets: Visual Genome (VG-150) and Open Images V6.

Behavioral counterparts of pairnet/datasets/sg.py (SceneGraphDataset over
vg150.json) and pairnet/datasets/open_images.py (OIV6Dataset): same json
schema as PSG (data / test_image_ids / thing_classes / stuff_classes /
predicate_classes) but annotations are boxes only — no panoptic PNGs.
Relations are 1-indexed on load and relation-less images dropped, exactly
like PSG. OIV6 enforces bbox-only evaluation (ref: open_images.py:216-217).
"""

from __future__ import annotations

import numpy as np

from pairnet_tpu.config.registry import DATASETS
from pairnet_tpu.data.psg import PSGDataset


@DATASETS.register()
class SceneGraphDataset(PSGDataset):
    """VG-150: reuses the PSG reader; masks are unavailable.

    ``load_masks`` synthesizes box masks only for pipeline compatibility;
    evaluation must use detection_method='bbox'.
    """

    detection_method = "bbox"

    def load_masks(self, idx: int):
        d = self.data[idx]
        n = len(d.annotations)
        boxes = np.asarray([a["bbox"] for a in d.annotations], np.float32)
        labels = np.asarray([a["category_id"] for a in d.annotations], np.int64)
        masks = np.zeros((n, d.height, d.width), bool)
        for i, b in enumerate(boxes):
            x0, y0, x1, y1 = (int(v) for v in b)
            masks[i, max(y0, 0) : max(y1, 0), max(x0, 0) : max(x1, 0)] = True
        semantic = np.full((d.height, d.width), 255, np.uint8)
        return masks, labels, semantic


@DATASETS.register()
class OIV6Dataset(SceneGraphDataset):
    """Open Images V6 SGG (ref: open_images.py:16-336); bbox eval only."""

    detection_method = "bbox"


class BalancedRelationDataset:
    """LVIS-style repeat-factor oversampling keyed on predicate frequency.

    Counterpart of pairnet/datasets/balanced_wrapper.py:7-95: per-predicate
    repeat factor r(c) = max(1, sqrt(thr / f(c))); per-image factor
    r(I) = max over predicates present. The reference loads frequencies from
    a .pt file; here they default to the wrapped dataset's own statistics.
    """

    def __init__(self, dataset, oversample_thr: float, rel_cls_freq: dict | None = None):
        self.dataset = dataset
        self.CLASSES = dataset.CLASSES
        self.PREDICATES = dataset.PREDICATES

        if rel_cls_freq is None:
            freq = np.zeros(len(dataset.PREDICATES) + 1)
            for i in range(len(dataset)):
                for p in dataset.data[i].relations[:, 2]:
                    freq[int(p)] += 1
            rel_cls_freq = {c: f for c, f in enumerate(freq) if f > 0}

        total = sum(rel_cls_freq.values())
        repeat = {
            c: max(1.0, np.sqrt(oversample_thr / (f / total)))
            for c, f in rel_cls_freq.items()
        }

        self.repeat_indices: list[int] = []
        for idx in range(len(dataset)):
            rels = dataset.get_ann_info(idx)["rels"]
            factors = [repeat.get(int(p), 1.0) for p in rels[:, 2]] or [1.0]
            self.repeat_indices.extend([idx] * int(np.ceil(max(factors))))

    def __len__(self) -> int:
        return len(self.repeat_indices)

    def __getattr__(self, name):
        return getattr(self.dataset, name)

    def _map(self, idx: int) -> int:
        return self.repeat_indices[idx]

    def get_ann_info(self, idx: int):
        return self.dataset.get_ann_info(self._map(idx))

    def load_image(self, idx: int):
        return self.dataset.load_image(self._map(idx))

    def load_masks(self, idx: int):
        return self.dataset.load_masks(self._map(idx))

    @property
    def data(self):
        return _IndexedView(self.dataset.data, self.repeat_indices)


class _IndexedView:
    def __init__(self, base, indices):
        self._base = base
        self._indices = indices

    def __len__(self):
        return len(self._indices)

    def __getitem__(self, i):
        return self._base[self._indices[i]]

    def __iter__(self):
        for i in self._indices:
            yield self._base[i]
