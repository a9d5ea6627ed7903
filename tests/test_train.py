"""Trainer tests: sharded train step over the 8-device CPU mesh, ckpt/resume."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.parallel.mesh import make_mesh, shard_batch
from pairnet_tpu.train.optim import (
    build_optimizer,
    lr_mult_tree,
    norm_free_decay_mask,
    step_lr_schedule,
)
from pairnet_tpu.train.trainer import TrainState, Trainer, make_train_step
from tests.tiny import NUM_PREDICATES, make_dataset, tiny_pairnet, tiny_pipeline_cfg

from pairnet_tpu.data.pipeline import Loader


def test_optimizer_masks():
    model = tiny_pairnet()
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables["params"]
    )
    mults = lr_mult_tree(
        params,
        {"backbone/conv1": 0.0, "backbone": 0.1, "pixel_decoder": 0.1},
    )
    assert mults["backbone"]["conv1"]["kernel"] == 0.0
    assert mults["backbone"]["layer2_0"]["conv1"]["kernel"] == 0.1
    assert mults["bbox_head"]["rel_cls_embed"]["kernel"] == 1.0
    # pixel decoder is nested under bbox_head
    assert mults["bbox_head"]["pixel_decoder"]["mask_feature"]["kernel"] == 0.1

    mask = norm_free_decay_mask(params)
    # LayerNorm scale/bias excluded from decay, Dense kernels included
    assert mask["bbox_head"]["transformer_decoder"]["post_norm"]["scale"] is False
    assert mask["bbox_head"]["rel_cls_embed"]["kernel"] is True


def test_step_lr_schedule():
    sched = step_lr_schedule(1e-4, steps_per_epoch=10, decay_epochs=(5, 10))
    assert np.isclose(sched(0), 1e-4)
    assert np.isclose(sched(49), 1e-4)
    assert np.isclose(sched(50), 5e-5)
    assert np.isclose(sched(100), 2.5e-5)


def test_sharded_train_step_runs_and_learns(tmp_path):
    mesh = make_mesh()  # 8 CPU devices -> data axis 8
    assert mesh.devices.size == 8
    ds = make_dataset(tmp_path)
    cfg = tiny_pipeline_cfg()
    model = tiny_pairnet()
    loader = Loader(ds, cfg, batch_size=8, train=True, seed=0, drop_last=False)
    batch0 = next(iter(loader))

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch0["image"])
    )
    tx = build_optimizer(variables["params"], base_lr=1e-3)
    state = TrainState.create(variables, tx, NUM_PREDICATES)
    from pairnet_tpu.parallel.mesh import replicate

    state = replicate(mesh, state)
    step = jax.jit(make_train_step(model, tx, {"num_points": 128}))

    p0 = jax.device_get(state.params["params"]["bbox_head"]["rel_cls_embed"]["kernel"])
    losses = []
    for i in range(3):
        b = shard_batch(mesh, {k: v for k, v in batch0.items() if k != "batch_valid"})
        state, metrics = step(state, b)
        losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses)), losses
    assert int(state.step) == 3
    assert float(metrics["grad_norm"]) > 0
    # the optimizer actually moves unfrozen params
    p1 = jax.device_get(state.params["params"]["bbox_head"]["rel_cls_embed"]["kernel"])
    assert np.abs(p1 - p0).max() > 0
    # frozen stem must NOT move (lr_mult 0.0)
    c0 = variables["params"]["backbone"]["conv1"]["kernel"]
    c1 = jax.device_get(state.params["params"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(np.asarray(c0), c1)
    # seesaw counts monotone increasing
    assert float(state.cum_samples.sum()) > 0


def test_bf16_mixed_precision_step(tmp_path):
    """compute_dtype=bf16: fwd/bwd on bf16 casts, master params/opt stay f32,
    losses finite and close to the f32 step's (same batch, same init)."""
    ds = make_dataset(tmp_path)
    cfg = tiny_pipeline_cfg()
    model = tiny_pairnet()
    loader = Loader(ds, cfg, batch_size=4, train=True, seed=0, drop_last=False)
    batch0 = {
        k: v for k, v in next(iter(loader)).items() if k != "batch_valid"
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch0["image"])
    )
    tx = build_optimizer(variables["params"], base_lr=1e-3)

    def one_step(compute_dtype):
        state = TrainState.create(variables, tx, NUM_PREDICATES)
        step = jax.jit(
            make_train_step(
                model, tx, {"num_points": 128}, compute_dtype=compute_dtype
            )
        )
        state, metrics = step(state, jax.device_get(batch0))
        return state, jax.device_get(metrics)

    state16, m16 = one_step(jnp.bfloat16)
    _, m32 = one_step(None)
    assert np.isfinite(m16["loss_total"]) and m16["grad_norm"] > 0
    # master params and optimizer state stay f32 after the bf16 update
    leaves = jax.tree_util.tree_leaves(state16.params["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    opt_leaves = [
        l
        for l in jax.tree_util.tree_leaves(state16.opt_state)
        if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert all(l.dtype == jnp.float32 for l in opt_leaves)
    # bf16 loss tracks the f32 loss (same targets; tolerance covers rounding)
    assert abs(m16["loss_total"] - m32["loss_total"]) < 0.15 * abs(
        m32["loss_total"]
    ) + 0.5, (m16["loss_total"], m32["loss_total"])


def test_trainer_fit_and_resume(tmp_path):
    ds = make_dataset(tmp_path / "data")
    cfg = tiny_pipeline_cfg()
    model = tiny_pairnet()
    loader = Loader(ds, cfg, batch_size=4, train=True, seed=0, drop_last=False)
    batch0 = next(iter(loader))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(batch0["image"])
    )
    tx = build_optimizer(variables["params"], base_lr=1e-4)
    state = TrainState.create(variables, tx, NUM_PREDICATES)
    mesh = make_mesh(n_data=4)
    trainer = Trainer(
        model, tx, state, str(tmp_path / "work"), mesh=mesh,
        loss_kwargs={"num_points": 64}, log_interval=1,
    )
    epoch_loader = lambda epoch: Loader(ds, cfg, 4, True, seed=epoch)
    val_loader = lambda epoch: Loader(ds, cfg, 4, False, drop_last=False)
    steps_per_epoch = len(epoch_loader(0))
    hook_calls = []
    last = trainer.fit(
        epoch_loader, max_epochs=1, val_loader_fn=val_loader,
        eval_hook=lambda state, epoch: hook_calls.append(epoch) or {"hooked": 1.0},
    )
    # val workflow ran (ref workflow=[('train',1),('val',1)]) + EvalHook fired
    assert any(k.startswith("val_") for k in last), last
    assert np.isfinite(last["val_loss_total"])
    assert hook_calls == [0] and last["hooked"] == 1.0
    step_after = int(jax.device_get(trainer.state.step))
    assert step_after == steps_per_epoch

    # resume picks up the checkpoint
    trainer2 = Trainer(
        model, tx, state, str(tmp_path / "work"), mesh=mesh,
        loss_kwargs={"num_points": 64},
    )
    start = trainer2.resume()
    assert start == 1
    assert int(jax.device_get(trainer2.state.step)) == step_after
