# CrossHeadBBox on Deformable-DETR R-50, Open Images V6
# (ref: configs/deformable_detr/cross_r50_oiv6.py)
_base_ = ["../_base_/runtime.py"]
num_object_classes = 601
num_relation_classes = 30
model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="CrossHeadBBox",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_obj_query=100,
        num_rel_query=100,
        mapper="conv_tiny",
        embed_dims=256,
    ),
)
data = dict(
    dataset=dict(type="OIV6Dataset", ann_file="oiv6.json", data_root="data/oiv6"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=2,
)
evaluation = dict(metric="sgdet", num_things=601, detection_method="bbox")
work_dir = "work_dirs/cross_r50_oiv6"
