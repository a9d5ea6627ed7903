"""Training loop: sharded jit train step, epoch runner, checkpointing.

Capability match for the reference runtime (ref: SURVEY.md §1 L4 — mmcv
EpochBasedRunner + OptimizerHook(grad clip) + CheckpointHook + LrUpdater +
TextLogger + EvalHook, DDP/NCCL), redesigned TPU-first:

* ONE jit-compiled train step containing forward, on-device target building
  (Hungarian), losses, grad, clip, AdamW update — zero host syncs,
* data parallelism via NamedSharding over a Mesh 'data' axis (XLA psum over
  ICI replaces DDP bucket allreduce),
* Seesaw cumulative class counts carried in the train state,
* Orbax checkpointing with keep-rotation and resume (ref §5.4),
* deterministic seeding (the reference pins seed 10086,
  ref: tools/train.py:204-209).
"""

from __future__ import annotations

import logging
import os
import time
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from pairnet_tpu.models.heads.pairnet_loss import pairnet_loss
from pairnet_tpu.parallel.mesh import make_mesh, replicate, shard_batch

logger = logging.getLogger("pairnet_tpu")


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    cum_samples: jnp.ndarray  # Seesaw running counts (num_relations,)
    rng: jnp.ndarray

    @classmethod
    def create(cls, variables, tx, num_relations: int, seed: int = 10086):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=variables,
            opt_state=tx.init(
                variables["params"] if "params" in variables else variables
            ),
            cum_samples=jnp.zeros((num_relations,), jnp.float32),
            rng=jax.random.PRNGKey(seed),
        )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_kwargs: dict | None = None,
    loss_fn=None,
    apply_adapter=None,
    compute_dtype=None,
) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, metrics).

    ``loss_fn(outputs, batch, rng, cum_state) -> (losses, new_cum_state)``
    defaults to the Pair-Net loss; ``apply_adapter(model, variables, batch,
    **kw)`` defaults to the single-stage image contract.

    ``compute_dtype=jnp.bfloat16`` enables mixed-precision training: the
    forward/backward run on bf16 params and activations (riding the bf16
    MXU path and the packed-pair deform kernel) while master params,
    gradients and the AdamW state stay f32 — autodiff through the cast
    accumulates the gradient back to f32.  The loss itself is computed on
    f32-upcast head outputs (softmax/Seesaw stay exact).
    """
    loss_kwargs = loss_kwargs or {}
    if loss_fn is None:
        def loss_fn(outputs, batch, rng, cum):  # noqa: F811 - default
            return pairnet_loss(outputs, batch, rng, cum, **loss_kwargs)
    if apply_adapter is None:
        def apply_adapter(model, variables, batch, **kw):
            return model.apply(variables, batch["image"], **kw)

    def train_step(state: TrainState, batch: dict):
        # the loader ships bool mask canvases (4x less host->device
        # traffic); losses want f32 — upcast once on device
        if "gt_masks" in batch and batch["gt_masks"].dtype == jnp.bool_:
            batch = dict(batch)
            batch["gt_masks"] = batch["gt_masks"].astype(jnp.float32)
        rng, points_rng, dropout_rng = jax.random.split(state.rng, 3)

        def _loss(params):
            variables = dict(state.params)
            variables["params"] = params
            bt = batch
            if compute_dtype is not None:
                cast = lambda t: (
                    t.astype(compute_dtype) if t.dtype == jnp.float32 else t
                )
                variables = jax.tree_util.tree_map(cast, variables)
                bt = dict(batch)
                bt["image"] = batch["image"].astype(compute_dtype)
            out = apply_adapter(
                model,
                variables,
                bt,
                deterministic=False,
                rngs={"dropout": dropout_rng},
            )
            if compute_dtype is not None:
                out = jax.tree_util.tree_map(
                    lambda t: t.astype(jnp.float32)
                    if t.dtype == compute_dtype
                    else t,
                    out,
                )
            losses, new_cum = loss_fn(out, batch, points_rng, state.cum_samples)
            return losses["loss_total"], (losses, new_cum)
        loss_fn_inner = _loss

        (_, (losses, new_cum)), grads = jax.value_and_grad(
            loss_fn_inner, has_aux=True
        )(state.params["params"])
        updates, new_opt = tx.update(
            grads, state.opt_state, state.params["params"]
        )
        new_params = optax.apply_updates(state.params["params"], updates)
        variables = dict(state.params)
        variables["params"] = new_params
        metrics = dict(losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(
                step=state.step + 1,
                params=variables,
                opt_state=new_opt,
                cum_samples=new_cum,
                rng=rng,
            ),
            metrics,
        )

    return train_step


def make_val_step(
    model, loss_kwargs: dict | None = None, loss_fn=None, apply_adapter=None
) -> Callable:
    """Build the jitted val step: (state, batch) -> metrics (no update).

    Mirrors the reference's ``workflow=[('train', 1), ('val', 1)]`` val pass
    (ref: configs/_base_/custom_runtime.py:18): same losses, deterministic
    forward, no gradient/optimizer/Seesaw-state mutation.
    """
    loss_kwargs = loss_kwargs or {}
    if loss_fn is None:
        def loss_fn(outputs, batch, rng, cum):  # noqa: F811 - default
            return pairnet_loss(outputs, batch, rng, cum, **loss_kwargs)
    if apply_adapter is None:
        def apply_adapter(model, variables, batch, **kw):
            return model.apply(variables, batch["image"], **kw)

    def val_step(state: TrainState, batch: dict):
        if "gt_masks" in batch and batch["gt_masks"].dtype == jnp.bool_:
            batch = dict(batch)
            batch["gt_masks"] = batch["gt_masks"].astype(jnp.float32)
        points_rng = jax.random.fold_in(state.rng, 1)
        out = apply_adapter(model, state.params, batch, deterministic=True)
        losses, _ = loss_fn(out, batch, points_rng, state.cum_samples)
        return losses

    return val_step


class Trainer:
    """Epoch runner with logging, checkpointing, train/val workflow and an
    optional eval hook (ref: mmcv EpochBasedRunner + EvalHook, SURVEY §1 L4)."""

    def __init__(
        self,
        model,
        tx,
        state: TrainState,
        work_dir: str,
        mesh=None,
        loss_kwargs: dict | None = None,
        loss_fn=None,
        apply_adapter=None,
        log_interval: int = 50,
        ckpt_interval_epochs: int = 1,
        max_keep_ckpts: int = 15,
        compute_dtype=None,
    ):
        self.model = model
        self.tx = tx
        self.mesh = mesh if mesh is not None else make_mesh()
        # deep-copy onto the mesh: the jitted step donates its input state, so
        # the trainer must own buffers distinct from the caller's. A jitted
        # identity always produces fresh output buffers (device_put with
        # may_alias=False does NOT guarantee a copy).
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        self.state = jax.jit(lambda t: t, out_shardings=rep)(state)
        self.work_dir = work_dir
        self.log_interval = log_interval
        self.ckpt_interval_epochs = ckpt_interval_epochs
        os.makedirs(work_dir, exist_ok=True)
        self._step_fn = jax.jit(
            make_train_step(
                model, tx, loss_kwargs, loss_fn, apply_adapter,
                compute_dtype=compute_dtype,
            ),
            donate_argnums=0,
        )
        self._val_fn = jax.jit(
            make_val_step(model, loss_kwargs, loss_fn, apply_adapter)
        )

        import orbax.checkpoint as ocp

        self._ckpt_mgr = ocp.CheckpointManager(
            os.path.abspath(os.path.join(work_dir, "ckpts")),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_keep_ckpts, create=True
            ),
        )

    def resume(self) -> int:
        """Resume from the latest checkpoint if present; returns start epoch."""
        latest = self._ckpt_mgr.latest_step()
        if latest is None:
            return 0
        import orbax.checkpoint as ocp

        self.state = self._ckpt_mgr.restore(
            latest, args=ocp.args.StandardRestore(self.state)
        )
        logger.info("resumed from checkpoint at epoch %d", latest)
        return latest

    def save(self, epoch: int) -> None:
        import orbax.checkpoint as ocp

        self._ckpt_mgr.save(
            epoch, args=ocp.args.StandardSave(jax.device_get(self.state))
        )
        self._ckpt_mgr.wait_until_finished()

    def train_epoch(self, loader, epoch: int) -> dict:
        t0 = time.time()
        last = {}
        # observability knobs (ref SURVEY.md §5.1-5.2: the reference has
        # none beyond iter timers; we expose a profiler trace + NaN guard)
        profile_dir = os.environ.get("PAIRNET_PROFILE_DIR")
        nan_check = bool(os.environ.get("PAIRNET_DEBUG_NANS"))
        for i, batch in enumerate(loader):
            if profile_dir and epoch == 0 and i == 2:
                jax.profiler.start_trace(profile_dir)
            batch = shard_batch(self.mesh, batch)
            self.state, metrics = self._step_fn(self.state, batch)
            if profile_dir and epoch == 0 and i == 4:
                jax.block_until_ready(metrics)
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", profile_dir)
            if nan_check:
                m = jax.device_get(metrics)
                bad = {k: float(v) for k, v in m.items() if not float(v) == float(v)}
                if bad:
                    raise FloatingPointError(
                        f"NaN losses at epoch {epoch} iter {i}: {bad}"
                    )
            if (i + 1) % self.log_interval == 0 or i == 0:
                metrics = jax.device_get(metrics)
                last = {k: float(v) for k, v in metrics.items()}
                dt = (time.time() - t0) / (i + 1)
                logger.info(
                    "epoch %d iter %d time %.3fs %s",
                    epoch, i + 1, dt,
                    " ".join(f"{k}={v:.4f}" for k, v in last.items()),
                )
        return last

    def val_epoch(self, loader, epoch: int) -> dict:
        """Validation-loss pass (the reference's ('val', 1) workflow leg)."""
        sums: dict = {}
        n = 0
        for batch in loader:
            batch = shard_batch(self.mesh, batch)
            losses = jax.device_get(self._val_fn(self.state, batch))
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        means = {f"val_{k}": v / max(n, 1) for k, v in sums.items()}
        logger.info(
            "epoch %d val %s", epoch,
            " ".join(f"{k}={v:.4f}" for k, v in means.items()),
        )
        return means

    def fit(
        self,
        loader_fn: Callable[[int], Any],
        max_epochs: int,
        val_loader_fn: Callable[[int], Any] | None = None,
        eval_hook: Callable[[Any, int], dict] | None = None,
        eval_interval: int = 1,
    ) -> dict:
        """Train with the reference workflow: per epoch train, then optional
        val-loss pass, then optional eval hook (metric evaluation) every
        ``eval_interval`` epochs (ref: mmcv EvalHook)."""
        start = self.resume()
        last = {}
        for epoch in range(start, max_epochs):
            last = self.train_epoch(loader_fn(epoch), epoch)
            if val_loader_fn is not None:
                last.update(self.val_epoch(val_loader_fn(epoch), epoch))
            if (epoch + 1) % self.ckpt_interval_epochs == 0:
                self.save(epoch + 1)
            if eval_hook is not None and (epoch + 1) % eval_interval == 0:
                last.update(eval_hook(self.state, epoch))
        return last
