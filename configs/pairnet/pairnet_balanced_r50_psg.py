# Pair-Net R-50 with BalancedRelationDataset oversampling
# (ref: configs/mask2former/pairnet_balanced.py + _base_/datasets/balanced_psg.py:
# repeat-factor oversample_thr on predicate frequency; 12 epochs, step 40;
# warm-start load_from a relation-free Pair-Net checkpoint)
_base_ = ["pairnet_r50_psg.py"]
data = dict(
    dataset=dict(balanced=dict(oversample_thr=0.03)),
)
schedule = dict(decay_epochs=[40], gamma=0.1, max_epochs=12)
load_from = "pretrain/cross_no_rel"  # converted checkpoint dir (optional)
work_dir = "work_dirs/pairnet_balanced_r50_psg"
