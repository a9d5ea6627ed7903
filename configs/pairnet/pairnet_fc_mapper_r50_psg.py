# Matrix Learner ablation: 7-layer MLP mapper (ref: pairnet/models/frameworks/fc.py)
_base_ = ["./pairnet_r50_psg.py"]
model = dict(bbox_head=dict(mapper="fc"))
work_dir = "work_dirs/pairnet_fc_mapper_r50_psg"
