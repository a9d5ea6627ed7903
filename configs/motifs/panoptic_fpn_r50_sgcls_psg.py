# MotifHead sgcls: GT boxes, predicted labels
# (ref: configs/motifs/panoptic_fpn_r50_fpn_1x_sgcls_psg.py)
_base_ = ["./panoptic_fpn_r50_predcls_psg.py"]
model = dict(relation_head=dict(mode="sgcls"))
evaluation = dict(metric="sgcls", num_things=80)
work_dir = "work_dirs/motifs_sgcls_psg"
