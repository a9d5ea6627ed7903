# PSGTr R-101 (ref: configs/psgtr/psgtr_r101_psg.py)
_base_ = ["psgtr_r50_psg.py"]
model = dict(backbone=dict(type="ResNet", depth=101))
work_dir = "work_dirs/psgtr_r101_psg"
