"""Head-type -> (loss fn, postprocess fn) dispatch for the CLIs.

The reference dispatches through mmdet's registry + per-head forward_train /
simple_test methods; here the mapping is explicit. Loss callables share the
signature ``loss(outputs, batch, rng, state) -> (losses, new_state)`` where
``state`` carries Seesaw cumulative counts (None when unused).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def get_loss_fn(head_type: str, cfg) -> Callable:
    loss_cfg = dict(cfg.get("loss", {}))

    if head_type == "PairNetHead":
        from pairnet_tpu.models.heads.pairnet_loss import pairnet_loss

        def fn(outputs, batch, rng, state):
            losses, new_cum = pairnet_loss(outputs, batch, rng, state, **loss_cfg)
            return losses, new_cum

        fn.needs_cum = True
        return fn

    if head_type == "CrossHeadBBox":
        if loss_cfg.pop("detection_only", False):
            # OD pretraining: detection losses only (ref:
            # configs/deformable_detr/od_r101_vg.py)
            from pairnet_tpu.models.heads.pairnet_bbox_head import (
                deformable_detr_detection_loss,
            )

            def fn(outputs, batch, rng, state):
                return (
                    deformable_detr_detection_loss(outputs, batch, **loss_cfg),
                    state,
                )

            fn.needs_cum = False
            return fn

        from pairnet_tpu.models.heads.pairnet_bbox_head import pairnet_bbox_loss

        def fn(outputs, batch, rng, state):
            return pairnet_bbox_loss(outputs, batch, rng, state, **loss_cfg)

        fn.needs_cum = True
        return fn

    if head_type == "BaselineHead":
        from pairnet_tpu.models.heads.baseline_head import baseline_loss

        if loss_cfg.get("use_seesaw"):
            # CrossHead4 variant: Seesaw relation loss carries running
            # class counts in the train state (ref: baseline_seesaw.py)
            def fn(outputs, batch, rng, state):
                return baseline_loss(
                    outputs, batch, rng, cum_samples=state, **loss_cfg
                )

            fn.needs_cum = True
            return fn

        def fn(outputs, batch, rng, state):
            return baseline_loss(outputs, batch, rng, **loss_cfg), state

        fn.needs_cum = False
        return fn

    if head_type == "PSGTrHead":
        from pairnet_tpu.models.heads.psgtr_head import psgtr_loss

        def fn(outputs, batch, rng, state):
            return psgtr_loss(outputs, batch, **loss_cfg), state

        fn.needs_cum = False
        return fn

    if head_type == "PSGTr2Head":
        from pairnet_tpu.models.heads.psgtr2_head import psgtr2_loss

        def fn(outputs, batch, rng, state):
            return psgtr2_loss(outputs, batch, rng, **loss_cfg), state

        fn.needs_cum = False
        return fn

    if head_type == "PSGFormerHead":
        from pairnet_tpu.models.heads.psgformer_head import psgformer_loss

        def fn(outputs, batch, rng, state):
            return psgformer_loss(outputs, batch, rng, **loss_cfg), state

        fn.needs_cum = False
        return fn

    if head_type == "Detr4SegHead":
        from pairnet_tpu.models.heads.detr4seg_head import detr4seg_loss

        def fn(outputs, batch, rng, state):
            return detr4seg_loss(outputs, batch, rng, **loss_cfg), state

        fn.needs_cum = False
        return fn

    if head_type in ("MotifHead", "IMPHead", "GPSHead", "VCTreeHead"):
        from pairnet_tpu.models.heads.twostage.heads import twostage_loss

        def fn(outputs, batch, rng, state):
            losses = twostage_loss(outputs, batch, **loss_cfg)
            if head_type == "VCTreeHead":
                from pairnet_tpu.models.heads.twostage.vctree import (
                    vctree_binary_loss,
                )

                losses["loss_tree"] = vctree_binary_loss(
                    outputs["relatedness"], batch
                )
                losses["loss_total"] = losses["loss_total"] + losses["loss_tree"]
            return losses, state

        fn.needs_cum = False
        return fn

    raise KeyError(f"no loss dispatch for head type '{head_type}'")


def get_postprocess_fn(head_type: str) -> Callable:
    """Per-image raw outputs -> TripletPrediction (or protocol dict)."""
    if head_type in ("PairNetHead",):
        from pairnet_tpu.models.heads.pairnet_inference import pairnet_postprocess

        return pairnet_postprocess
    if head_type in ("BaselineHead", "PSGFormerHead"):
        from pairnet_tpu.models.heads.baseline_head import baseline_postprocess

        return baseline_postprocess
    if head_type == "PSGTrHead":
        from pairnet_tpu.models.heads.psgtr_head import psgtr_postprocess

        return psgtr_postprocess
    if head_type == "PSGTr2Head":
        from pairnet_tpu.models.heads.psgtr2_head import psgtr2_postprocess

        return psgtr2_postprocess
    if head_type == "CrossHeadBBox":
        from pairnet_tpu.models.heads.pairnet_bbox_head import (
            pairnet_bbox_postprocess,
        )

        return pairnet_bbox_postprocess
    if head_type == "Detr4SegHead":
        from pairnet_tpu.models.heads.detr4seg_head import detr4seg_postprocess

        return detr4seg_postprocess
    raise KeyError(f"no postprocess dispatch for head type '{head_type}'")
