# Pair-Net (CrossHead2/Mask2Former) on Swin-B over VG-style data
# (ref: configs/deformable_detr/cross_swinb_vg.py: SwinTransformer
# embed_dims=128 backbone + CrossHead2 head)
_base_ = ["../pairnet/pairnet_swinb_psg.py"]
data = dict(
    dataset=dict(type="SceneGraphDataset", ann_file="vg150.json", data_root="data/vg"),
)
evaluation = dict(metric="sgdet", num_things=150, detection_method="bbox")
work_dir = "work_dirs/cross_swinb_vg"
