"""Config -> model / dataset / pipeline / optimizer assembly for the CLIs."""

from __future__ import annotations

import os

from pairnet_tpu.config import Config
from pairnet_tpu.data.pipeline import PipelineConfig
from pairnet_tpu.data.psg import PSGDataset
from pairnet_tpu.models.frameworks.psgtr import build_model


def build_pipeline_cfg(cfg: Config, train: bool) -> PipelineConfig:
    p = dict(cfg.data.pipeline)
    if not train:
        p.pop("train_scales", None)
        p["flip_prob"] = 0.0
        p["crop_prob"] = 0.0
    p["target_size"] = tuple(p["target_size"])
    if "train_scales" in p:
        p["train_scales"] = tuple(p["train_scales"])
    return PipelineConfig(**p)


def build_dataset(cfg: Config, split: str):
    d = dict(cfg.data.dataset)
    ds_type = d.pop("type", "PSGDataset")
    synthetic = d.pop("synthetic", False)
    if synthetic and not d.get("data_root"):
        # synthetic=True -> the default 8-image fixture; synthetic=dict(...)
        # forwards generator options (num_images/height/width/...), cached
        # under an option-keyed /tmp root
        opts = dict(synthetic) if isinstance(synthetic, (dict, Config)) else {}
        opts.setdefault("num_images", 8)
        opts.setdefault("num_test", 3)
        opts.setdefault("seed", 1)
        tag = "_".join(f"{k}{opts[k]}" for k in sorted(opts))
        root = os.path.join(
            "/tmp",
            "pairnet_tpu_synthetic"
            if tag == "num_images8_num_test3_seed1"
            else f"pairnet_tpu_synthetic_{tag}",
        )
        if not os.path.exists(os.path.join(root, "psg.json")):
            from pairnet_tpu.data.synthetic import make_synthetic_psg

            os.makedirs(root, exist_ok=True)
            make_synthetic_psg(root, **opts)
        d["data_root"] = root
    from pairnet_tpu.config.registry import DATASETS
    from pairnet_tpu.data import sg  # noqa: F401  (registers SG datasets)

    balanced = d.pop("balanced", None)
    ds = DATASETS.get(ds_type)(split=split, **d)
    if balanced and split == "train":
        # BalancedRelationDataset wrapper (ref: datasets/balanced_wrapper.py:7,
        # selected by configs/_base_/datasets/balanced_psg.py)
        ds = sg.BalancedRelationDataset(ds, **dict(balanced))
    return ds


def build_detector(cfg: Config):
    return build_model(cfg.model)
