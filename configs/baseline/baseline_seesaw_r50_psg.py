# CrossHead4: baseline + Seesaw relation loss (ref: configs/mask2former/baseline_seesaw.py)
_base_ = ["./baseline_r50_psg.py"]
loss = dict(use_seesaw=True)
work_dir = "work_dirs/baseline_seesaw_r50_psg"
