# MotifHead predcls (ref: configs/motifs/panoptic_fpn_r50_fpn_1x_predcls_psg.py)
_base_ = ["../_base_/runtime.py"]
num_object_classes = 133
num_relation_classes = 56
model = dict(
    type="SceneGraphTwoStage",
    backbone=dict(type="ResNet", depth=50),
    relation_head=dict(
        type="MotifHead",
        num_classes=num_object_classes + 1,
        num_predicates=num_relation_classes + 1,
        mode="predcls",
        hidden_dim=512,
        roi_dim=1024,
        context_pooling_dim=4096,
        embed_dim=200,
        use_bias=False,
    ),
)
data = dict(
    dataset=dict(type="PSGDataset", ann_file="psg.json", data_root="data/psg"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=16,
)
# reference uses SGD(0.03, momentum) with warmup for the two-stage heads
optimizer = dict(lr=0.03, grad_clip=35.0)
evaluation = dict(metric="predcls", num_things=80)
work_dir = "work_dirs/motifs_predcls_psg"
