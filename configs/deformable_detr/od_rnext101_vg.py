# Object-detection pretraining on VG boxes, ResNeXt-101 32x8d backbone
# (ref: configs/deformable_detr/od_rnext101_vg.py — mmdet DeformableDETR on
# ResNeXt(depth=101, groups=32, base_width=8) trained detection-only)
_base_ = ["./pairnet_rnext101_vg.py"]
loss = dict(detection_only=True)
work_dir = "work_dirs/od_rnext101_vg"
