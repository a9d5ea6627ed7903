"""Shared tiny-model fixture helpers for tests."""

import numpy as np

from pairnet_tpu.data.pipeline import Loader, PipelineConfig
from pairnet_tpu.data.psg import PSGDataset
from pairnet_tpu.data.synthetic import PREDICATES, STUFF_CLASSES, THING_CLASSES, make_synthetic_psg
from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.psgtr import PSGTr
from pairnet_tpu.models.heads.pairnet_head import PairNetHead

NUM_CLASSES = len(THING_CLASSES) + len(STUFF_CLASSES)
NUM_PREDICATES = len(PREDICATES)


def tiny_pairnet(num_queries=20, num_rel_queries=16, dims=32):
    head = PairNetHead(
        num_classes=NUM_CLASSES,
        num_relations=NUM_PREDICATES,
        num_obj_query=num_queries,
        num_rel_query=num_rel_queries,
        embed_dims=dims,
        num_heads=4,
        num_decoder_layers=3,
        num_relation_layers=2,
        pixel_decoder_layers=1,
    )
    return PSGTr(backbone=ResNet(depth=26, base_width=8), bbox_head=head)


def tiny_pipeline_cfg(**kw):
    defaults = dict(
        target_size=(96, 128), size_divisor=32, max_inst=8, max_rels=10,
        flip_prob=0.0,
    )
    defaults.update(kw)
    return PipelineConfig(**defaults)


def make_dataset(tmpdir, split="train", **kw):
    make_synthetic_psg(str(tmpdir), num_images=8, num_test=3, seed=1, **kw)
    return PSGDataset(f"{tmpdir}/psg.json", data_root=str(tmpdir), split=split)
