"""VG/OIV6 dataset readers, balanced wrapper, and PQ metric tests."""

import numpy as np
import pytest

from pairnet_tpu.data.sg import (
    BalancedRelationDataset,
    OIV6Dataset,
    SceneGraphDataset,
)
from pairnet_tpu.evaluation.panoptic_quality import (
    VOID,
    pan_seg_to_ids,
    pq_compute,
    pq_single_image,
)
from tests.tiny import make_dataset


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    d = tmp_path_factory.mktemp("sgdata")
    make_dataset(d)  # writes psg.json + images (sg datasets share the schema)
    return str(d)


def test_vg_dataset_box_masks(root):
    ds = SceneGraphDataset(f"{root}/psg.json", data_root=root, split="train")
    assert len(ds) == 5
    masks, labels, _ = ds.load_masks(0)
    ann = ds.get_ann_info(0)
    assert masks.shape[0] == len(ann["masks"])
    # box masks are filled rectangles matching the annotation boxes
    b = np.asarray(ds.data[0].annotations[1]["bbox"], int)
    assert masks[1][b[1] : b[3], b[0] : b[2]].all()
    assert ds.detection_method == "bbox"
    assert OIV6Dataset(f"{root}/psg.json", data_root=root).detection_method == "bbox"


def test_balanced_wrapper_oversamples(root):
    ds = SceneGraphDataset(f"{root}/psg.json", data_root=root, split="train")
    # make predicate 1 very rare and mark image 0 as its only holder
    freq = {1: 1.0, 2: 100.0, 3: 100.0, 4: 100.0, 5: 100.0}
    ds.data[0].relations = np.asarray([[0, 1, 1]], np.int32)
    for d in ds.data[1:]:
        d.relations[:, 2] = 2
    wrapped = BalancedRelationDataset(ds, oversample_thr=0.5, rel_cls_freq=freq)
    assert len(wrapped) > len(ds)
    # image 0 repeated much more than the common ones
    counts = np.bincount(wrapped.repeat_indices)
    assert counts[0] > counts[1]


def test_pq_perfect_and_mismatch():
    gt = np.zeros((10, 10), np.int64)
    gt[:5] = 1
    gt[5:] = 2
    gt_map = {1: 0, 2: 1}
    # perfect prediction
    res = pq_single_image(gt, gt_map, gt.copy(), dict(gt_map), num_classes=3)
    assert res[0].tp == 1 and res[0].iou == pytest.approx(1.0)
    assert res[1].tp == 1

    # misclassified second segment -> FN for class 1, FP for class 2
    pred_map = {1: 0, 2: 2}
    res = pq_single_image(gt, gt_map, gt.copy(), pred_map, num_classes=3)
    assert res[1].fn == 1
    assert res[2].fp == 1

    out = pq_compute([(gt, gt_map, gt.copy(), dict(gt_map))], num_classes=3, num_things=2)
    assert out["All"]["PQ"] == pytest.approx(100.0)


def test_pq_iou_threshold():
    gt = np.full((10, 10), VOID, np.int64)
    gt[:, :6] = 1
    pred = np.full((10, 10), VOID, np.int64)
    pred[:, 3:9] = 7  # IoU with gt seg = 3/9 = 0.33 < 0.5
    res = pq_single_image(gt, {1: 0}, pred, {7: 0}, num_classes=1)
    assert res[0].tp == 0 and res[0].fn == 1 and res[0].fp == 1


def test_pan_seg_decode():
    pan = np.asarray([[1000 * 3 + 7, 1000 * 2 + 5]])
    ids, id2label = pan_seg_to_ids(pan)
    assert id2label[3007] == 7 and id2label[2005] == 5
