# Pair-Net R-50 on PSG — counterpart of the reference's flagship
# configs/mask2former/pairnet.py.
_base_ = ["../_base_/runtime.py"]

num_object_classes = 133
num_relation_classes = 56

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
    num_points=12544,
    rel_loss_weight=2.0,
    subobj_loss_weight=4.0,
    match_loss_weight=5.0,
    with_seg_losses=False,
)

data = dict(
    dataset=dict(
        type="PSGDataset",
        ann_file="psg.json",
        data_root="data/psg",
    ),
    pipeline=dict(
        target_size=(800, 1333),
        size_divisor=32,
        mask_stride=4,
        max_inst=64,
        max_rels=100,
        flip_prob=0.5,
        train_scales=(480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800),
        # AutoAugment branch 2 (ref: configs/mask2former/pairnet.py:245-298):
        # resize {400,500,600} -> RelRandomCrop(384..600) -> multi-scale resize
        crop_prob=0.5,
        crop_scales=(400, 500, 600),
        crop_size_range=(384, 600),
    ),
    samples_per_device=2,
)

evaluation = dict(metric="sgdet", num_things=80, iou_thr=0.5)
work_dir = "work_dirs/pairnet_r50_psg"
