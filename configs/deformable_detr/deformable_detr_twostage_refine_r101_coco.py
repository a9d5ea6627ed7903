# Deformable-DETR two-stage + refine, R-101, COCO
# (ref: configs/deformable_detr/deformable_detr_twostage_refine_r101_16x2_50e_coco.py)
_base_ = ["./deformable_detr_r50_coco.py"]
model = dict(
    backbone=dict(depth=101),
    bbox_head=dict(as_two_stage=True, with_box_refine=True),
)
work_dir = "work_dirs/deformable_detr_twostage_refine_r101_coco"
