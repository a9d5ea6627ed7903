# Pair-Net Swin-B flagship row (ref: SURVEY.md §6 last row)
_base_ = ["pairnet_r50_psg.py"]
model = dict(
    backbone=dict(
        _delete_=True,
        type="SwinTransformer",
        embed_dim=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        window=12,
    ),
)
work_dir = "work_dirs/pairnet_swinb_psg"
