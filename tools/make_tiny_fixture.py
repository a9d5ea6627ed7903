#!/usr/bin/env python
"""Regenerate the overfit tiny-synthetic eval-quality fixture.

The fixture (default ``work_dirs/tiny_ab2``) is a seeded overfit run of
``configs/pairnet/tiny_synthetic.py`` on its hermetic synthetic PSG dataset,
trained until the train-split sgdet R@20 clears a quality bar (~0.9 at
convergence). It is consumed by:

* ``tests/test_device_eval_e2e.py`` — device recall engine vs numpy oracle
  parity on a checkpoint that actually ranks triplets correctly;
* ``tools/ab_kernel_precision.py`` — kernel-numerics impact at the metric
  level (R@K deltas across deform-attn implementations).

It is NOT tracked in git (binary churn); run this script once per machine:

    python tools/make_tiny_fixture.py            # ~1 min on TPU
    python tools/make_tiny_fixture.py --epochs 250 --out work_dirs/tiny_ab2

Everything is seeded (data synthesis, init, and shuffling all derive from
cfg.seed = 10086), so regenerated fixtures reproduce the same quality bar;
bitwise identity across jax/XLA versions is not guaranteed or needed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=None)
    p.add_argument(
        "--epochs", type=int, default=0,
        help="override epoch count (default: 250 tiny / 80 full-dim)",
    )
    p.add_argument("--min-r20", type=float, default=0.8)
    p.add_argument(
        "--full-dim", action="store_true",
        help="train the production-width fixture (fulldim_synthetic.py) "
        "instead of the tiny one — for bf16-vs-f32 numerics bounds",
    )
    args = p.parse_args()

    name = "fulldim_synthetic" if args.full_dim else "tiny_synthetic"
    cfg = os.path.join(REPO, "configs", "pairnet", f"{name}.py")
    default_out = "work_dirs/fulldim_fixture" if args.full_dim else "work_dirs/tiny_ab2"
    out = os.path.join(REPO, args.out or default_out)
    args.epochs = args.epochs or (80 if args.full_dim else 250)
    env = dict(os.environ)
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "train.py"), cfg,
            "--work-dir", out, "--max-epochs", str(args.epochs),
            "--cfg-options", "checkpoint.interval_epochs=%d" % args.epochs,
            "checkpoint.max_keep=1",
        ],
        check=True, env=env,
    )
    # quality gate: the fixture is only useful if it overfits
    import json

    metrics_path = os.path.join(out, "fixture_metrics.json")
    subprocess.run(
        [
            sys.executable, os.path.join(REPO, "tools", "test.py"), cfg, out,
            "--eval", "sgdet", "--split", "train", "--out", metrics_path,
        ],
        check=True, env=env,
    )
    r20 = json.load(open(metrics_path))["sgdet_recall_R@20"]
    if r20 < args.min_r20:
        raise SystemExit(
            f"fixture quality gate failed (R@20 {r20} < {args.min_r20}); "
            "increase --epochs"
        )
    print(f"fixture OK at {out}: train R@20 = {r20}")


if __name__ == "__main__":
    main()
