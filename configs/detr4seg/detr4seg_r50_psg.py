# seg-only DETR panoptic pretraining on PSG
# (ref: configs/_base_/models/detr4seg_r50.py + frameworks/detr4seg.py)
_base_ = ["../_base_/runtime.py"]
num_object_classes = 133
num_relation_classes = 56
model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="Detr4SegHead",
        num_classes=num_object_classes,
        num_query=100,
        embed_dims=256,
    ),
)
data = dict(
    dataset=dict(type="PSGDataset", ann_file="psg.json", data_root="data/psg"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=2,
)
evaluation = dict(metric="sgdet", num_things=80)
work_dir = "work_dirs/detr4seg_r50"
