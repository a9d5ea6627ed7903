"""Dataset converter roundtrips: synthetic VG-150 h5 / GQA json ->
tools/convert_datasets.py -> loadable SceneGraphDataset."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tools")
import convert_datasets as cd  # noqa: E402

from pairnet_tpu.data.sg import SceneGraphDataset  # noqa: E402


def _write_vg_fixture(tmp_path):
    h5py = pytest.importorskip("h5py")
    img_data = [
        {"image_id": 1, "file_name": "1.jpg", "height": 300, "width": 400},
        {"image_id": 2, "file_name": "2.jpg", "height": 200, "width": 100},
    ]
    dicts = {
        "idx_to_label": {"1": "dog", "2": "person"},
        "idx_to_predicate": {"1": "riding", "2": "near"},
        "idx_to_attribute": {},
    }
    # image 0: boxes 0-1, one rel; image 1: boxes 2-3, one rel
    with h5py.File(tmp_path / "vg.h5", "w") as f:
        f["img_to_first_box"] = np.array([0, 2])
        f["img_to_last_box"] = np.array([1, 3])
        f["img_to_first_rel"] = np.array([0, 1])
        f["img_to_last_rel"] = np.array([0, 1])
        # cxcywh at 1024 scale (long side)
        f["boxes_1024"] = np.array(
            [[512, 384, 256, 256], [256, 192, 128, 128],
             [512, 256, 200, 100], [100, 100, 50, 50]], np.float32
        )
        f["labels"] = np.array([[1], [2], [2], [1]])
        f["relationships"] = np.array([[0, 1], [2, 3]])
        f["predicates"] = np.array([[1], [2]])
    (tmp_path / "image_data.json").write_text(json.dumps(img_data))
    (tmp_path / "dicts.json").write_text(json.dumps(dicts))


def test_vg150_roundtrip(tmp_path):
    _write_vg_fixture(tmp_path)
    out = tmp_path / "vg150.json"
    cd.vg150_to_sg(tmp_path / "image_data.json", tmp_path / "dicts.json",
                   tmp_path / "vg.h5", out, val_split_idx=1)
    blob = json.loads(out.read_text())
    assert blob["thing_classes"] == ["dog", "person"]
    assert blob["predicate_classes"] == ["near", "riding"]
    assert blob["test_image_ids"] == ["2"]
    d0 = blob["data"][0]
    # cxcywh@1024 -> xyxy at original 400x300 (scale 1024/400)
    np.testing.assert_allclose(
        d0["annotations"][0]["bbox"], [150.0, 100.0, 250.0, 200.0]
    )
    assert d0["relations"] == [[0, 1, 1]]  # 'riding' -> sorted idx 1

    ds = SceneGraphDataset(ann_file=str(out), split="train")
    assert len(ds) == 1  # test image excluded
    rels = ds.data[0].relations
    assert rels[0][2] == 2  # 1-indexed on load


def test_gqa_roundtrip(tmp_path):
    train = {
        "100": {
            "height": 100, "width": 100,
            "objects": {
                "a": {"name": "cat", "x": 0, "y": 0, "w": 10, "h": 10,
                      "attributes": [],
                      "relations": [{"object": "b", "name": "on"}]},
                "b": {"name": "mat", "x": 5, "y": 5, "w": 20, "h": 20,
                      "attributes": [], "relations": []},
            },
        }
    }
    val = {
        "200": {
            "height": 50, "width": 50,
            "objects": {
                "c": {"name": "cat", "x": 1, "y": 1, "w": 5, "h": 5,
                      "attributes": [], "relations": []},
            },
        }
    }
    (tmp_path / "tr.json").write_text(json.dumps(train))
    (tmp_path / "va.json").write_text(json.dumps(val))
    out = tmp_path / "gqa.json"
    cd.gqa_to_sg(tmp_path / "tr.json", tmp_path / "va.json", out)
    blob = json.loads(out.read_text())
    assert blob["thing_classes"] == ["cat", "mat"]
    assert blob["predicate_classes"] == ["on"]
    assert blob["test_image_ids"] == ["200"]
    assert blob["data"][0]["relations"] == [[0, 1, 0]]
    assert blob["data"][0]["annotations"][1]["bbox"] == [5, 5, 25, 25]


def test_psg_to_kaihua(tmp_path):
    psg = {
        "data": [
            {"file_name": "x.jpg", "image_id": "7", "height": 10, "width": 10,
             "relations": [[0, 1, 0], [1, 0, 1]]}
        ],
        "thing_classes": ["dog"],
        "stuff_classes": ["sky"],
        "predicate_classes": ["on", "under"],
        "test_image_ids": [],
    }
    (tmp_path / "psg.json").write_text(json.dumps(psg))
    cd.psg_to_kaihua(tmp_path / "psg.json", tmp_path / "k")
    dicts = json.loads((tmp_path / "k" / "PSG-dicts.json").read_text())
    assert dicts["idx_to_label"] == {"1": "dog", "2": "sky"}
    assert dicts["predicate_count"] == {"on": 1, "under": 1}
    imgs = json.loads((tmp_path / "k" / "image_data.json").read_text())
    assert imgs[0]["image_id"] == "7"
