#!/usr/bin/env python
"""Loader-only throughput at eval geometry (1333x800-class images).

Proves the async input pipeline out-runs the model (VERDICT r1 weak #4:
a synchronous single-threaded loader would starve the chip at 9+ img/s).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from pairnet_tpu.data.psg import PSGDataset
    from pairnet_tpu.data.pipeline import Loader, PipelineConfig
    from pairnet_tpu.data.synthetic import make_synthetic_psg

    root = "/tmp/pairnet_loader_bench"
    if not os.path.exists(os.path.join(root, "psg.json")):
        os.makedirs(root, exist_ok=True)
        make_synthetic_psg(
            root, num_images=48, num_test=8, seed=0, height=800, width=1120
        )
    ds = PSGDataset(f"{root}/psg.json", data_root=root, split="train")
    cfg = PipelineConfig(target_size=(800, 1333), max_inst=64, max_rels=100)

    for workers in (0, 4, 8):
        loader = Loader(ds, cfg, batch_size=4, train=True, num_workers=workers)
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += int(batch["batch_valid"].sum())
        dt = time.perf_counter() - t0
        print(f"workers={workers}: {n / dt:7.2f} img/s  ({dt:.2f}s for {n})")


if __name__ == "__main__":
    main()
