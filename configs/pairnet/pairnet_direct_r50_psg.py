# CrossHeadDirect ablation: pair features classified directly, no Relation
# Fusion decoder (ref: configs/mask2former/pairnet_direct.py)
_base_ = ["./pairnet_r50_psg.py"]
model = dict(bbox_head=dict(direct=True))
work_dir = "work_dirs/pairnet_direct_r50_psg"
