# Tiny Pair-Net on the synthetic PSG fixture — hermetic end-to-end config
# for CI smoke runs of tools/train.py + tools/test.py.
_base_ = ["../_base_/runtime.py"]

num_object_classes = 7  # 4 things + 3 stuff (pairnet_tpu.data.synthetic)
num_relation_classes = 5

model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50, base_width=8),
    bbox_head=dict(
        type="PairNetHead",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_obj_query=20,
        num_rel_query=16,
        mapper="conv_tiny",
        embed_dims=32,
        num_heads=4,
        num_decoder_layers=3,
        num_relation_layers=2,
        num_feat_levels=3,
        pixel_decoder_layers=1,
    ),
)

loss = dict(num_points=256, with_seg_losses=True)

data = dict(
    dataset=dict(
        type="PSGDataset",
        ann_file="psg.json",
        data_root="",  # filled by --cfg-options or synthesized on demand
        synthetic=True,  # tools generate the fixture if data_root is empty
    ),
    pipeline=dict(
        target_size=(96, 128),
        size_divisor=32,
        mask_stride=4,
        max_inst=8,
        max_rels=10,
        flip_prob=0.0,
    ),
    samples_per_device=2,
)

optimizer = dict(lr=1e-3)
schedule = dict(decay_epochs=[100], max_epochs=2)
evaluation = dict(metric="sgdet", num_things=4, iou_thr=0.5)
work_dir = "work_dirs/tiny_synthetic"
