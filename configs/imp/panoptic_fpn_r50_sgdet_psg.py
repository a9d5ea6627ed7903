# IMPHead sgdet: frozen PanopticFPN detector provides boxes/labels/masks
# (ref: configs/imp/panoptic_fpn_r50_fpn_1x_sgdet_psg.py)
_base_ = ["panoptic_fpn_r50_predcls_psg.py"]
model = dict(
    relation_head=dict(mode="sgdet"),
    detector=dict(
        type="PanopticFPN",
        num_things=80,
        num_stuff=53,
        score_thr=0.3,
    ),
)
evaluation = dict(metric="sgdet")
work_dir = "work_dirs/imp_sgdet_psg"
