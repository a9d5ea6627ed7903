# Base runtime config (counterpart of configs/_base_/custom_runtime.py +
# the optimizer/schedule blocks of configs/mask2former/pairnet.py:352-372
# in the reference).
optimizer = dict(
    lr=1e-4,
    weight_decay=1e-4,
    grad_clip=0.1,
    # lr multipliers by param-path substring; first match wins.
    custom_lr_keys={
        "backbone/conv1": 0.0,  # frozen_stages=1
        "backbone/bn1": 0.0,
        "backbone/layer1": 0.0,
        "backbone": 0.1,
        "transformer_decoder": 0.1,
        "pixel_decoder": 0.1,
    },
    auto_scale_lr_base_batch=8,
)
schedule = dict(decay_epochs=[5, 10], gamma=0.5, max_epochs=15)
log_interval = 50
checkpoint = dict(interval_epochs=1, max_keep=15)
seed = 10086
work_dir = "work_dirs/default"
