#!/usr/bin/env python
"""Render saved prediction results: panoptic overlay + top-k triplet graph.

Counterpart of the reference's tools/vis_results.py (ref: SURVEY.md §2.6,
tools/vis_results.py:1-60): load a results file (produced by
``tools/test.py --save-results results.pkl``) plus the dataset from the
config, and write per-image visualizations (original | panoptic overlay |
triplet-outlined) and a .triplets.txt with the ranked
'subject --predicate--> object' list.

Usage:
    python tools/vis_results.py CONFIG RESULTS.pkl [--out-dir viz]
                                [--topk 20] [--limit N] [--split test]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Visualize saved PSG results")
    p.add_argument("config")
    p.add_argument("results", help="pickle from tools/test.py --save-results")
    p.add_argument("--out-dir", default="viz")
    p.add_argument("--topk", type=int, default=20)
    p.add_argument("--limit", type=int, default=0, help="max images (0=all)")
    p.add_argument("--split", default="test")
    p.add_argument(
        "--cfg-options", nargs="+", default=[], help="dotted-path overrides k=v"
    )
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import numpy as np

    from pairnet_tpu.config import apply_overrides, load_config
    from pairnet_tpu.evaluation.runner import load_predictions
    from pairnet_tpu.train.builder import build_dataset
    from pairnet_tpu.utils.visualize import save_visualization

    cfg = load_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, args.cfg_options)
    dataset = build_dataset(cfg, split=args.split)
    preds = load_predictions(args.results)
    if len(preds) != len(dataset):
        raise SystemExit(
            f"results file has {len(preds)} images, dataset has {len(dataset)}"
        )
    os.makedirs(args.out_dir, exist_ok=True)

    n = min(len(preds), args.limit) if args.limit else len(preds)
    for i in range(n):
        img = np.asarray(dataset.load_image(i), np.uint8)
        p = preds[i]
        r_scores = p.rel_dists[:, 1:].max(-1)
        r_labels = p.rel_dists[:, 1:].argmax(-1) + 1
        pan_seg = None
        if p.masks is not None and p.masks.shape[1:] == img.shape[:2]:
            # simple painter's panoptic view: later (lower-scored) masks
            # never overwrite earlier ones
            pan_seg = np.zeros(img.shape[:2], np.int64)
            order = np.argsort(-r_scores)
            painted = np.zeros(img.shape[:2], bool)
            for rank in order[: args.topk]:
                for idx in p.rel_pair_idxes[rank]:
                    m = p.masks[int(idx)] & ~painted
                    pan_seg[m] = int(idx) + 1
                    painted |= m
        out = os.path.join(args.out_dir, f"{i:06d}.png")
        lines = save_visualization(
            out,
            img,
            pan_seg=pan_seg,
            masks=p.masks,
            labels=p.labels,
            rel_pairs=p.rel_pair_idxes,
            r_labels=r_labels,
            r_scores=r_scores,
            class_names=list(dataset.CLASSES),
            predicate_names=list(dataset.PREDICATES),
            topk=args.topk,
        )
        logging.info("%s: %d triplets rendered", out, len(lines))
    logging.info("wrote %d visualizations to %s", n, args.out_dir)


if __name__ == "__main__":
    main()
