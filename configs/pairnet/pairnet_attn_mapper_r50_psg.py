# Matrix Learner ablation: dual-axis attention mapper
# (ref: pairnet/models/frameworks/attn.py, configs variants)
_base_ = ["./pairnet_r50_psg.py"]
model = dict(bbox_head=dict(mapper="attn"))
work_dir = "work_dirs/pairnet_attn_mapper_r50_psg"
