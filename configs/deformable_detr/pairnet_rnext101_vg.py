# Pair-Net on Deformable-DETR for Visual Genome, ResNeXt-101 32x8d backbone
# (ref: configs/deformable_detr/pairnet_rnext101_vg.py)
_base_ = ["./pairnet_r101_vg.py"]
model = dict(
    backbone=dict(
        _delete_=True, type="ResNeXt", depth=101, groups=32, base_width=8
    ),
)
work_dir = "work_dirs/pairnet_rnext101_vg"
