# DETR4seg R-101 (ref: configs/_base_/models/detr4seg_r101_psg.py)
_base_ = ["detr4seg_r50_psg.py"]
model = dict(backbone=dict(type="ResNet", depth=101))
work_dir = "work_dirs/detr4seg_r101_psg"
