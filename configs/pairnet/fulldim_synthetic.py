# Full-dimension Pair-Net on a synthetic PSG fixture.
#
# Same ARCHITECTURE as the flagship configs/pairnet/pairnet_r50_psg.py
# (embed 256, 8 heads, 6 encoder + 9 decoder + 6 relation layers, 100
# object/relation queries, R-50) but trained on the hermetic synthetic
# dataset at 384x512. Purpose: a trained checkpoint at PRODUCTION widths
# for numerics experiments that the embed-32 tiny fixture cannot support —
# specifically the full-model bf16-vs-f32 R@K bound (VERDICT r3 #2) via
# tools/ab_dtype_fullmodel.py. Regenerate with tools/make_tiny_fixture.py
# --full-dim (seeded; ~10 min on one v5e chip).
_base_ = ["../_base_/runtime.py"]

num_object_classes = 7  # 4 things + 3 stuff (pairnet_tpu.data.synthetic)
num_relation_classes = 5

model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="PairNetHead",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_obj_query=100,
        num_rel_query=100,
        mapper="conv_tiny",
        embed_dims=256,
        num_heads=8,
        num_decoder_layers=9,
        num_relation_layers=6,
        num_feat_levels=3,
        pixel_decoder_layers=6,
    ),
)

loss = dict(
    num_points=2048,
    rel_loss_weight=2.0,
    subobj_loss_weight=4.0,
    match_loss_weight=5.0,
    with_seg_losses=True,  # no COCO warm-start here: train the segmenter too
)

data = dict(
    dataset=dict(
        type="PSGDataset",
        ann_file="psg.json",
        data_root="",
        synthetic=dict(
            num_images=24, num_test=6, height=384, width=512, seed=2
        ),
    ),
    pipeline=dict(
        target_size=(384, 512),
        size_divisor=32,
        mask_stride=4,
        max_inst=8,
        max_rels=10,
        flip_prob=0.0,
    ),
    samples_per_device=2,
)

optimizer = dict(lr=2e-4)
schedule = dict(decay_epochs=[60], max_epochs=80)
evaluation = dict(metric="sgdet", num_things=4, iou_thr=0.5)
work_dir = "work_dirs/fulldim_synthetic"
