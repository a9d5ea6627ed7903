# MotifHead sgdet: frozen PanopticFPN detector provides boxes/labels/masks
# (ref: configs/motifs/panoptic_fpn_r50_fpn_1x_sgdet_psg.py)
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
        mode="sgdet",
        hidden_dim=512,
        roi_dim=1024,
        context_pooling_dim=4096,
        embed_dim=200,
        use_bias=False,
    ),
    # eval-time detector (frozen, ref: sg_panoptic_fpn.py:166-202)
    detector=dict(
        type="PanopticFPN",
        num_things=80,
        num_stuff=53,
        score_thr=0.3,
    ),
)
data = dict(
    dataset=dict(type="PSGDataset", ann_file="psg.json", data_root="data/psg"),
    pipeline=dict(target_size=(800, 1333), mask_stride=4, max_inst=64, max_rels=100),
    samples_per_device=16,
)
optimizer = dict(lr=0.03, grad_clip=35.0)
evaluation = dict(metric="sgdet", num_things=80)
work_dir = "work_dirs/motifs_sgdet_psg"
