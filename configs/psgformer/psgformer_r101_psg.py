# PSGFormer R-101 (ref: configs/psgformer/psgformer_r101_psg.py)
_base_ = ["psgformer_r50_psg.py"]
model = dict(backbone=dict(type="ResNet", depth=101))
work_dir = "work_dirs/psgformer_r101_psg"
