# R-101 variant (ref: configs/imp/panoptic_fpn_r101_fpn_1x_sgdet_psg.py)
_base_ = ["panoptic_fpn_r50_sgdet_psg.py"]
model = dict(backbone=dict(depth=101))
work_dir = "work_dirs/imp_r101_sgdet_psg"
