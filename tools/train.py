#!/usr/bin/env python
"""Train a scene-graph model (counterpart of the reference tools/train.py).

Usage:
    python tools/train.py CONFIG [--work-dir D] [--max-steps N]
                          [--resume] [--cfg-options k=v ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    # CPU AOT cache reload is broken in this image (SIGILL/hangs); TPU only
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def parse_args():
    p = argparse.ArgumentParser(description="Train a PSG model")
    p.add_argument("config")
    p.add_argument("--work-dir")
    p.add_argument("--max-steps", type=int, default=0, help="cap total steps (smoke)")
    p.add_argument("--max-epochs", type=int, default=0)
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--load-from",
        help="warm-start params (.npz of converted weights or Orbax ckpt dir)",
    )
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--cfg-options", nargs="+", default=[], help="dotted-path overrides k=v"
    )
    return p.parse_args()


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import jax.numpy as jnp

    from pairnet_tpu.config import apply_overrides, load_config
    from pairnet_tpu.data.pipeline import Loader
    from pairnet_tpu.parallel.mesh import make_mesh
    from pairnet_tpu.train.builder import (
        build_dataset,
        build_detector,
        build_pipeline_cfg,
    )
    from pairnet_tpu.train.optim import build_optimizer, step_lr_schedule
    from pairnet_tpu.train.trainer import TrainState, Trainer

    from pairnet_tpu.parallel.mesh import init_distributed

    # multi-host init (counterpart of init_dist/--launcher,
    # ref: tools/train.py:169-176); single-process runs are a no-op
    init_distributed()

    cfg = load_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, args.cfg_options)
    work_dir = args.work_dir or cfg.work_dir
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config.json"))

    seed = args.seed if args.seed is not None else cfg.get("seed", 10086)
    dataset = build_dataset(cfg, split="train")
    pipe_cfg = build_pipeline_cfg(cfg, train=True)
    mesh = make_mesh()
    n_dev = mesh.devices.size
    batch_size = cfg.data.samples_per_device * n_dev

    head_key = "relation_head" if "relation_head" in cfg.model else "bbox_head"
    head_type = cfg.model[head_key].type
    from pairnet_tpu.train.dispatch import get_loss_fn

    loss_fn = get_loss_fn(head_type, cfg)
    sample_transform = None
    apply_adapter = None
    if cfg.model.type == "SceneGraphTwoStage":
        from pairnet_tpu.data.pipeline import to_twostage_batch

        max_pairs = cfg.data.get("max_pairs", 256)
        sample_transform = lambda s, rng: to_twostage_batch(
            s, max_pairs, train=True, rng=rng
        )
        apply_adapter = lambda m, v, b, **kw: m.apply(v, b, **kw)

    loader_fn = lambda epoch: Loader(
        dataset, pipe_cfg, batch_size, train=True, seed=seed + epoch,
        sample_transform=sample_transform,
    )
    steps_per_epoch = max(1, len(loader_fn(0)))

    model = build_detector(cfg)
    sample = next(iter(loader_fn(0)))
    if cfg.model.type == "SceneGraphTwoStage":
        init_input = {k: jnp.asarray(v[:1]) for k, v in sample.items()}
        variables = jax.jit(model.init)(jax.random.PRNGKey(seed), init_input)
    else:
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(seed), jnp.asarray(sample["image"][:1])
        )
    # load_from warm-start (ref §5.4: the reference's third load path —
    # e.g. COCO-pretrained Mask2Former, configs/mask2former/pairnet.py:394).
    # Accepts an .npz of flattened converted params (utils/torch_convert) or
    # an Orbax checkpoint dir written by a previous run.
    load_from = args.load_from or cfg.get("load_from")
    if load_from and os.path.exists(load_from):
        from pairnet_tpu.utils.torch_convert import merge_pretrained, unflatten

        if load_from.endswith(".npz"):
            import numpy as np

            pretrained = unflatten(dict(np.load(load_from)))
        else:
            import orbax.checkpoint as ocp

            mgr = ocp.CheckpointManager(os.path.abspath(load_from))
            raw = mgr.restore(
                mgr.latest_step(), args=ocp.args.StandardRestore()
            )
            pretrained = raw["params"] if "params" in raw else raw
        variables = merge_pretrained(variables, pretrained)
        logging.info("warm-started params from %s", load_from)
    elif load_from:
        logging.warning("load_from %s not found; training from scratch", load_from)
    n_params = sum(
        p.size for p in jax.tree_util.tree_leaves(variables["params"])
    )
    logging.info(
        "model %s: %.2fM params, %d devices, batch %d, %d steps/epoch",
        cfg.model.type, n_params / 1e6, n_dev, batch_size, steps_per_epoch,
    )

    base_lr = cfg.optimizer.lr
    scale_base = cfg.optimizer.get("auto_scale_lr_base_batch")
    if scale_base:
        base_lr = base_lr * batch_size / scale_base
    schedule = step_lr_schedule(
        base_lr, steps_per_epoch, cfg.schedule.decay_epochs, cfg.schedule.gamma
    )
    tx = build_optimizer(
        variables["params"],
        weight_decay=cfg.optimizer.weight_decay,
        grad_clip=cfg.optimizer.grad_clip,
        custom_lr_keys=dict(cfg.optimizer.custom_lr_keys),
        schedule=schedule,
    )
    cum_size = cfg.num_relation_classes
    if head_type == "BaselineHead" and cfg.get("loss", {}).get("use_seesaw"):
        cum_size += 1  # CrossHead4 Seesaw runs over R+1 incl the bg column
    state = TrainState.create(variables, tx, cum_size, seed=seed)
    # mixed-precision training (counterpart of the reference's fp16 hook;
    # on TPU the right dtype is bf16): cfg.compute_dtype = 'bfloat16'
    compute_dtype = {"bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16}.get(
        cfg.get("compute_dtype") or ""
    )
    trainer = Trainer(
        model, tx, state, work_dir, mesh=mesh,
        loss_fn=loss_fn,
        apply_adapter=apply_adapter,
        log_interval=cfg.get("log_interval", 50),
        ckpt_interval_epochs=cfg.checkpoint.interval_epochs,
        max_keep_ckpts=cfg.checkpoint.max_keep,
        compute_dtype=compute_dtype,
    )
    max_epochs = args.max_epochs or cfg.schedule.max_epochs
    if args.max_steps:
        max_epochs = min(max_epochs, -(-args.max_steps // steps_per_epoch))

    # val workflow: reference runs workflow=[('train', 1), ('val', 1)]
    # (ref: configs/_base_/custom_runtime.py:18); enable with
    # cfg.workflow = ['train', 'val']
    val_loader_fn = None
    if "val" in cfg.get("workflow", ["train"]):
        # PSG has no separate val split: test_image_ids IS the val set
        # (ref: pairnet/datasets/psg.py:80-90)
        val_dataset = build_dataset(cfg, split="test")
        val_pipe_cfg = build_pipeline_cfg(cfg, train=False)
        val_transform = None
        if cfg.model.type == "SceneGraphTwoStage":
            from pairnet_tpu.data.pipeline import to_twostage_batch

            val_transform = lambda s, rng: to_twostage_batch(
                s, cfg.data.get("max_pairs", 256), train=True, rng=rng
            )
        val_loader_fn = lambda epoch: Loader(
            val_dataset, val_pipe_cfg, batch_size, train=False,
            sample_transform=val_transform,
        )

    if not args.resume:
        # fresh run unless --resume (reference: --resume-from/--auto-resume)
        trainer.resume = lambda: 0  # type: ignore[method-assign]
    last = trainer.fit(loader_fn, max_epochs, val_loader_fn=val_loader_fn)
    logging.info("training done: %s", last)


if __name__ == "__main__":
    main()
