# PSGTr on Mask2Former pixel decoder (ref: configs/psgtr/psgtr_r50_psg_plus.py)
_base_ = ["../_base_/runtime.py"]
num_object_classes = 133
num_relation_classes = 56
model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="PSGTr2Head",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_query=100,
        embed_dims=256,
        num_decoder_layers=9,
        pixel_decoder_layers=6,
    ),
)
data = dict(
    dataset=dict(type="PSGDataset", ann_file="psg.json", data_root="data/psg"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=2,
)
evaluation = dict(metric="sgdet", num_things=80)
work_dir = "work_dirs/psgtr2_r50_psg"
