# Plain Deformable-DETR detection on COCO — the OD warm-start recipe
# (ref: configs/deformable_detr/deformable_detr_r50_16x2_50e_coco.py:
# 300 queries, no box refine, single-stage proposals, 50 epochs).
# Detection-only training of the CrossHeadBBox tree: the relation branch
# exists but contributes no loss, so the saved checkpoint warm-starts any
# cross_*/pairnet_* VG or OIV6 run via load_from.
_base_ = ["../_base_/runtime.py"]
num_object_classes = 80
num_relation_classes = 1  # unused (detection_only)
model = dict(
    type="PSGTr",
    backbone=dict(type="ResNet", depth=50),
    bbox_head=dict(
        type="CrossHeadBBox",
        num_classes=num_object_classes,
        num_relations=num_relation_classes,
        num_obj_query=300,
        num_rel_query=100,
        mapper="conv_tiny",
        embed_dims=256,
        as_two_stage=False,
        with_box_refine=False,
    ),
)
loss = dict(detection_only=True)
data = dict(
    dataset=dict(
        type="SceneGraphDataset", ann_file="coco_det.json", data_root="data/coco"
    ),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=100, max_rels=1),
    samples_per_device=2,
)
schedule = dict(decay_epochs=[40], max_epochs=50)
evaluation = dict(metric="sgdet", num_things=80, detection_method="bbox")
work_dir = "work_dirs/deformable_detr_r50_coco"
