# Pair-Net R-50, 60-epoch schedule (ref: configs/mask2former/pairnet_60e.py:
# lr steps [48, 55] gamma 0.1, EpochBasedRunner max_epochs=60)
_base_ = ["pairnet_r50_psg.py"]
schedule = dict(decay_epochs=[48, 55], gamma=0.1, max_epochs=60)
work_dir = "work_dirs/pairnet_60e_r50_psg"
