# Pair-Net bbox head (CrossHeadBBox) on Deformable-DETR R-101, Visual Genome
# (ref: configs/deformable_detr/cross_r101_vg.py)
_base_ = ["pairnet_r101_vg.py"]
model = dict(bbox_head=dict(as_two_stage=False, with_box_refine=False))
work_dir = "work_dirs/cross_r101_vg"
