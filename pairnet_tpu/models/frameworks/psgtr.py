"""Single-stage scene-graph detector shell.

Counterpart of the reference's ``PSGTr`` detector
(ref: pairnet/models/frameworks/psgtr.py:72-156): backbone -> one-stage
relation head. GT mask padding/downsampling lives in the data pipeline here
(fixed shapes), not in the forward pass.
"""

from __future__ import annotations

from typing import Any, Mapping

from flax import linen as nn

from pairnet_tpu.config.registry import MODELS, build, BACKBONES, HEADS


@MODELS.register()
class PSGTr(nn.Module):
    """backbone + single-stage head; returns the head's prediction dict."""

    backbone: nn.Module
    bbox_head: nn.Module

    def __call__(self, images, deterministic: bool = True):
        feats = self.backbone(images)
        return self.bbox_head(feats, deterministic=deterministic)


def build_model(cfg: Mapping[str, Any]) -> nn.Module:
    """Instantiate a detector from a model config node."""
    import pairnet_tpu.models  # noqa: F401 - populate registries

    model_cfg = dict(cfg)
    backbone = build(model_cfg.pop("backbone"), BACKBONES)
    kwargs: dict = {"backbone": backbone}
    if "bbox_head" in model_cfg:
        kwargs["bbox_head"] = build(model_cfg.pop("bbox_head"), HEADS)
    if "relation_head" in model_cfg:
        kwargs["relation_head"] = build(model_cfg.pop("relation_head"), HEADS)
    cls = MODELS.get(model_cfg.pop("type"))
    return cls(**kwargs, **model_cfg)
