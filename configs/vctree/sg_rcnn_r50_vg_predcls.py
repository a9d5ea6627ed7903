# VCTree predcls on Visual Genome boxes — SceneGraphRCNN counterpart
# (ref: pairnet/models/frameworks/sg_rcnn.py:14-60; VG baseline row in
# BASELINE.md). GT boxes flow through the batch in predcls, so the
# detector-agnostic SceneGraphTwoStage shell covers the RCNN path.
_base_ = ["../_base_/runtime.py"]
num_object_classes = 150
num_relation_classes = 50
model = dict(
    type="SceneGraphTwoStage",
    backbone=dict(type="ResNet", depth=50),
    relation_head=dict(
        type="VCTreeHead",
        num_classes=num_object_classes + 1,
        num_predicates=num_relation_classes + 1,
        mode="predcls",
        hidden_dim=512,
        roi_dim=1024,
        context_pooling_dim=4096,
        embed_dim=200,
        use_bias=True,
    ),
)
data = dict(
    dataset=dict(
        type="SceneGraphDataset", ann_file="vg.json", data_root="data/vg"
    ),
    pipeline=dict(
        target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100
    ),
    samples_per_device=16,
)
optimizer = dict(lr=0.03, grad_clip=35.0)
evaluation = dict(metric="predcls", num_things=150, detection_method="bbox")
work_dir = "work_dirs/vctree_predcls_vg"
