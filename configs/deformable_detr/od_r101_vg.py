# Object-detection pretraining on VG boxes for the bbox Pair-Net pipeline
# (ref: configs/deformable_detr/od_r101_vg.py — mmdet DeformableDETR trained
# detection-only to warm-start the VG relation runs)
_base_ = ["./pairnet_r101_vg.py"]
loss = dict(detection_only=True)
work_dir = "work_dirs/od_r101_vg"
