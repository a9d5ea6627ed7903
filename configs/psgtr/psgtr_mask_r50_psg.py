# PSGTr warm-started from a mask-pretrained checkpoint, 60 epochs
# (ref: configs/psgtr/psgtr_mask_r50.py: load_from psgtr_mask_dict.pth,
# max_epochs=60)
_base_ = ["psgtr_r50_psg.py"]
schedule = dict(max_epochs=60, decay_epochs=[48, 55], gamma=0.1)
load_from = "pretrain/psgtr_mask"  # converted checkpoint dir (optional)
work_dir = "work_dirs/psgtr_mask_r50_psg"
