# Original PSGFormer (ref: configs/psgformer/psgformer_r50.py)
_base_ = ["../_base_/runtime.py"]
num_object_classes = 133
num_relation_classes = 56
model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="PSGFormerHead",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_obj_query=100,
        num_rel_query=100,
        embed_dims=256,
        num_encoder_layers=6,
        num_decoder_layers=6,
        temp=0.1,
    ),
)
data = dict(
    dataset=dict(type="PSGDataset", ann_file="psg.json", data_root="data/psg"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=2,
)
evaluation = dict(metric="sgdet", num_things=80)
work_dir = "work_dirs/psgformer_r50_psg"
