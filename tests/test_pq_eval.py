"""PQ evaluation runner + CLI plumbing (VERDICT r3 #3).

The PQ *engine* (panoptic_quality.pq_compute) is unit-tested in
test_datasets_extra.py; this covers the new split-level runner
(evaluate_pq): GT decode via PSGDataset.load_pan_ids, prediction id-map
upsampling/VOID handling, and the metric dict shape. An oracle
postprocessor built from the GT must score (near-)perfect PQ; the only
loss is stride-4 nearest resampling at segment boundaries.
"""

from typing import NamedTuple

import numpy as np
import pytest

from pairnet_tpu.config import load_config
from pairnet_tpu.data.pipeline import Loader
from pairnet_tpu.evaluation.runner import evaluate_pq
from pairnet_tpu.models.heads.pairnet_inference import INSTANCE_OFFSET
from pairnet_tpu.train.builder import build_dataset, build_pipeline_cfg

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class _FakeTrip(NamedTuple):  # jit-returnable (pytree) like TripletPrediction
    pan_seg: object


def test_evaluate_pq_oracle_scores_perfect():
    import jax.numpy as jnp

    cfg = load_config(os.path.join(REPO, "configs", "pairnet", "tiny_synthetic.py"))
    dataset = build_dataset(cfg, split="train")
    pipe_cfg = build_pipeline_cfg(cfg, train=False)

    # oracle pan_seg maps on the stride-4 padded canvas, one per image
    loader = Loader(dataset, pipe_cfg, 1, train=False, seed=0)
    ph, pw = pipe_cfg.padded_hw()
    s = pipe_cfg.mask_stride
    canvases = []
    for idx, batch in enumerate(loader):
        gt_ids, gt_map = dataset.load_pan_ids(idx)
        rh, rw = (int(x) for x in batch["image_shape"][0])
        ch, cw = -(-rh // s), -(-rw // s)
        oh, ow = gt_ids.shape
        # nearest-downsample GT ids into the canvas valid region
        yi = np.minimum((np.arange(ch) * oh) // ch, oh - 1)
        xi = np.minimum((np.arange(cw) * ow) // cw, ow - 1)
        small = gt_ids[yi][:, xi]
        canvas = np.full((ph // s, pw // s), INSTANCE_OFFSET * 7, np.int32)
        # encode as m_id * OFFSET + label like the head's fusion output
        enc = np.full(small.shape, INSTANCE_OFFSET * 7, np.int32)
        for seg_id, label in gt_map.items():
            enc[small == seg_id] = seg_id * INSTANCE_OFFSET + label
        canvas[:ch, :cw] = enc
        canvases.append(jnp.asarray(canvas))

    calls = {"n": 0}

    def fake_apply(img):
        # apply_fn runs OUTSIDE jit: route the per-image oracle canvas
        # through the output dict (the jitted postprocessor's closure would
        # be frozen at trace time)
        idx = calls["n"]
        calls["n"] += 1
        return {"pan": canvases[idx][None]}

    def fake_post(out, b, num_things=80):
        return _FakeTrip(out["pan"][b])

    metrics = evaluate_pq(
        fake_apply,
        fake_post,
        dataset,
        pipe_cfg,
        batch_size=1,
        num_classes=7,
        num_things=4,
    )
    assert metrics["All_RQ"] == pytest.approx(100.0)
    # SQ < 100 comes only from stride-4 nearest resampling: the 96x128
    # fixture's 12-px-min rectangles are ~3 px on the canvas, so boundary
    # loss is proportionally large here (production 800x1344 is ~10x finer)
    assert metrics["All_PQ"] > 85.0
    assert metrics["Things_PQ"] > 80.0
    assert metrics["Stuff_PQ"] > 90.0
    for k in ("All_SQ", "Things_RQ", "Stuff_RQ", "All_n"):
        assert k in metrics


def test_evaluate_pq_rejects_headless_postprocessor():
    cfg = load_config(os.path.join(REPO, "configs", "pairnet", "tiny_synthetic.py"))
    dataset = build_dataset(cfg, split="train")
    pipe_cfg = build_pipeline_cfg(cfg, train=False)

    class _Boxy(NamedTuple):
        boxes: object

    with pytest.raises(ValueError, match="pan_seg"):
        evaluate_pq(
            lambda img: {"x": img.sum()},
            lambda out, b, num_things=80: _Boxy(boxes=out["x"]),
            dataset,
            pipe_cfg,
            num_classes=7,
            num_things=4,
        )
