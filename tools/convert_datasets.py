#!/usr/bin/env python
"""Dataset converters: VG-150 / GQA -> the framework's SG json; PSG export.

Behavioral counterparts of tools/vis_tools/preprocess.py (ref:
process_vg_150_to_detectron:163-310, process_gqa_to_detectron:529-647) and
tools/vis_tools/postprocess.py (ref: psg_to_kaihua:541-683), retargeted at
THIS framework's single-file dataset schema (the one PSGDataset /
SceneGraphDataset read):

    {"data": [{file_name, height, width, image_id,
               annotations: [{bbox: xyxy, category_id}],
               relations: [[sub_idx, obj_idx, predicate_0based], ...]}],
     "test_image_ids": [...],
     "thing_classes": [...], "stuff_classes": [],
     "predicate_classes": [...]}

Usage:
    python tools/convert_datasets.py vg150 --image-data image_data.json \
        --dicts VG-SGG-dicts.json --h5 VG-SGG.h5 --out data/vg/vg150.json
    python tools/convert_datasets.py gqa --train train_sceneGraphs.json \
        --val val_sceneGraphs.json --out data/gqa/gqa.json
    python tools/convert_datasets.py psg2kaihua --psg data/psg/psg.json \
        --out-dir data/psg_kaihua
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path


def _load(p):
    with open(p) as f:
        return json.load(f)


def _save(obj, p):
    Path(p).parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        json.dump(obj, f)
    print(f"wrote {p}")


def vg150_to_sg(image_data_path, dicts_path, h5_path, out_path,
                val_split_idx: int = 75651):
    """VG-150 (Xu et al. splits, VG-SGG.h5) -> SceneGraphDataset json.

    Boxes are stored in the h5 as cxcywh on the 1024-long-side scale
    (ref: preprocess.py:94-142 rescales via BOX_SCALE/max(h,w)); categories
    come 1-based from the dicts file. Images past ``val_split_idx`` form
    the test split (ref: preprocess.py:216-221).
    """
    import h5py
    import numpy as np

    img_data = _load(image_data_path)
    meta = _load(dicts_path)
    obj_cats = sorted(meta["idx_to_label"].values())
    rel_cats = sorted(meta["idx_to_predicate"].values())
    obj_to_id = {c: i for i, c in enumerate(obj_cats)}
    rel_to_id = {c: i for i, c in enumerate(rel_cats)}

    with h5py.File(h5_path, "r") as f:
        first_box = f["img_to_first_box"][:]
        last_box = f["img_to_last_box"][:]
        first_rel = f["img_to_first_rel"][:]
        last_rel = f["img_to_last_rel"][:]
        boxes_1024 = f["boxes_1024"][:]
        labels = f["labels"][:]
        relationships = f["relationships"][:]
        predicates = f["predicates"][:]

    data, test_ids = [], []
    for i in range(len(first_box)):
        img = img_data[i]
        h, w = img["height"], img["width"]
        scale = 1024.0 / max(h, w)
        entry = {
            "file_name": img.get("file_name", f"{img['image_id']}.jpg"),
            "height": h,
            "width": w,
            "image_id": str(img["image_id"]),
            "annotations": [],
            "relations": [],
        }
        b0, b1 = int(first_box[i]), int(last_box[i])
        if b0 < 0:
            continue
        box_idx_to_local = {}
        for j, bi in enumerate(range(b0, b1 + 1)):
            cx, cy, bw, bh = (boxes_1024[bi] / scale).tolist()
            name = meta["idx_to_label"][str(int(labels[bi][0]))]
            entry["annotations"].append(
                {
                    "bbox": [cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                    "category_id": obj_to_id[name],
                }
            )
            box_idx_to_local[bi] = j
        r0, r1 = int(first_rel[i]), int(last_rel[i])
        if r0 >= 0:
            for ri in range(r0, r1 + 1):
                name = meta["idx_to_predicate"][str(int(predicates[ri][0]))]
                s = box_idx_to_local[int(relationships[ri][0])]
                o = box_idx_to_local[int(relationships[ri][1])]
                entry["relations"].append([s, o, rel_to_id[name]])
        if i >= val_split_idx:
            test_ids.append(entry["image_id"])
        data.append(entry)

    _save(
        {
            "data": data,
            "test_image_ids": test_ids,
            "thing_classes": obj_cats,
            "stuff_classes": [],
            "predicate_classes": rel_cats,
        },
        out_path,
    )
    print(f"{len(data)} images ({len(test_ids)} test), "
          f"{len(obj_cats)} objects, {len(rel_cats)} predicates")


def gqa_to_sg(train_path, val_path, out_path):
    """GQA sceneGraphs json pair -> SceneGraphDataset json (val = test)."""
    train, val = _load(train_path), _load(val_path)
    obj_cats, rel_cats = set(), set()
    for split in (train, val):
        for img in split.values():
            for obj in img["objects"].values():
                obj_cats.add(obj["name"])
                for rel in obj["relations"]:
                    rel_cats.add(rel["name"])
    obj_cats, rel_cats = sorted(obj_cats), sorted(rel_cats)
    obj_to_id = {c: i for i, c in enumerate(obj_cats)}
    rel_to_id = {c: i for i, c in enumerate(rel_cats)}

    data, test_ids = [], []
    for split, is_test in ((train, False), (val, True)):
        for img_id, img in split.items():
            entry = {
                "file_name": f"{img_id}.jpg",
                "height": img["height"],
                "width": img["width"],
                "image_id": str(img_id),
                "annotations": [],
                "relations": [],
            }
            local = {}
            pending = []
            for i, (obj_id, obj) in enumerate(img["objects"].items()):
                entry["annotations"].append(
                    {
                        "bbox": [obj["x"], obj["y"],
                                 obj["x"] + obj["w"], obj["y"] + obj["h"]],
                        "category_id": obj_to_id[obj["name"]],
                    }
                )
                local[obj_id] = i
                for rel in obj["relations"]:
                    pending.append((obj_id, rel["object"], rel_to_id[rel["name"]]))
            for s, o, r in pending:
                if s in local and o in local:
                    entry["relations"].append([local[s], local[o], r])
            if is_test:
                test_ids.append(entry["image_id"])
            data.append(entry)

    _save(
        {
            "data": data,
            "test_image_ids": test_ids,
            "thing_classes": obj_cats,
            "stuff_classes": [],
            "predicate_classes": rel_cats,
        },
        out_path,
    )
    print(f"{len(data)} images ({len(test_ids)} test), "
          f"{len(obj_cats)} objects, {len(rel_cats)} predicates")


def psg_to_kaihua(psg_path, out_dir):
    """PSG json -> Kaihua-Tang SGG-benchmark metadata (PSG-dicts.json +
    image_data.json; 1-based label/predicate ids, predicate counts)."""
    psg = _load(psg_path)
    obj_cats = psg["thing_classes"] + psg["stuff_classes"]
    pred_cats = psg["predicate_classes"]
    idx_to_label = {str(i + 1): c for i, c in enumerate(obj_cats)}
    idx_to_predicate = {str(i + 1): c for i, c in enumerate(pred_cats)}
    counts = Counter(
        pred_cats[r[2]] for d in psg["data"] for r in d["relations"]
    )
    out_dir = Path(out_dir)
    _save(
        {
            "label_to_idx": {v: int(k) for k, v in idx_to_label.items()},
            "idx_to_label": idx_to_label,
            "predicate_to_idx": {v: int(k) for k, v in idx_to_predicate.items()},
            "idx_to_predicate": idx_to_predicate,
            "predicate_count": dict(counts),
            "attribute_count": {},
            "idx_to_attribute": {},
            "attribute_to_idx": {},
        },
        out_dir / "PSG-dicts.json",
    )
    _save(
        [
            {
                "file_name": d["file_name"],
                "image_id": d.get("vg_image_id", d["image_id"]),
                "height": d["height"],
                "width": d["width"],
            }
            for d in psg["data"]
        ],
        out_dir / "image_data.json",
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("vg150")
    p.add_argument("--image-data", required=True)
    p.add_argument("--dicts", required=True)
    p.add_argument("--h5", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--val-split-idx", type=int, default=75651)
    p = sub.add_parser("gqa")
    p.add_argument("--train", required=True)
    p.add_argument("--val", required=True)
    p.add_argument("--out", required=True)
    p = sub.add_parser("psg2kaihua")
    p.add_argument("--psg", required=True)
    p.add_argument("--out-dir", required=True)
    args = ap.parse_args()
    if args.cmd == "vg150":
        vg150_to_sg(args.image_data, args.dicts, args.h5, args.out,
                    args.val_split_idx)
    elif args.cmd == "gqa":
        gqa_to_sg(args.train, args.val, args.out)
    else:
        psg_to_kaihua(args.psg, args.out_dir)


if __name__ == "__main__":
    main()
