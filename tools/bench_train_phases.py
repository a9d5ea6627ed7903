#!/usr/bin/env python
"""Train-step phase table: forward+loss / +backward / +optimizer (VERDICT r3 #4).

Times three cumulative prefixes of the production train step at bench
geometry (800x1344, batch 4, bf16 compute by default):

  1. forward + Hungarian targets + losses          (loss only)
  2. 1 + backward                                   (value_and_grad)
  3. 2 + grad clip + AdamW update                   (full train step)

Differences give the backward and optimizer shares. Chained-iteration +
scalar-fetch methodology per bench.py.

Usage: python tools/bench_train_phases.py [--batch 4] [--dtype bf16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def timed(fn, state, batch, iters=4, name=""):
    import jax
    import jax.numpy as jnp

    def chained(st, bt):
        st2, loss = fn(st, bt)
        bt = dict(bt)
        bt["image"] = jnp.roll(bt["image"], 1, axis=2) + (
            1e-6 * loss
        ).astype(bt["image"].dtype)
        return st2, bt, loss

    cfn = jax.jit(chained)
    st, bt, loss = cfn(state, batch)
    _ = float(loss)
    st, bt = state, batch
    t0 = time.perf_counter()
    for _i in range(iters):
        st, bt, loss = cfn(st, bt)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship
    from pairnet_tpu.models.heads.pairnet_loss import pairnet_loss
    from pairnet_tpu.train.optim import build_optimizer
    from pairnet_tpu.train.trainer import TrainState, make_train_step

    model = _flagship()
    B, H, W = args.batch, 800, 1344
    G, R = 24, 40
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(B, H, W, 3)), jnp.float32),
        "gt_labels": jnp.asarray(rng.integers(0, 133, size=(B, G)), jnp.int32),
        "gt_masks": jnp.asarray(
            rng.uniform(size=(B, G, H // 4, W // 4)) > 0.8, jnp.float32
        ),
        "gt_valid": jnp.asarray(np.ones((B, G), bool)),
        "gt_rels": jnp.asarray(
            np.stack(
                [rng.integers(0, G, (B, R)), rng.integers(0, G, (B, R)),
                 rng.integers(1, 56, (B, R))], -1,
            ), jnp.int32,
        ),
        "rel_valid": jnp.asarray(np.ones((B, R), bool)),
    }
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    tx = build_optimizer(variables["params"])
    state = TrainState.create(variables, tx, 56)
    compute_dtype = dict(bf16=jnp.bfloat16, f32=None)[args.dtype]
    loss_cfg = {"num_points": 12544}

    def _loss(st, params, bt, rngs):
        # mirrors make_train_step's inner loss (trainer.py:94-120)
        var = dict(st.params)
        var["params"] = params
        if compute_dtype is not None:
            cast = lambda t: (
                t.astype(compute_dtype) if t.dtype == jnp.float32 else t
            )
            var = jax.tree_util.tree_map(cast, var)
            bt = dict(bt)
            bt["image"] = bt["image"].astype(compute_dtype)
        out = model.apply(
            var, bt["image"], deterministic=False, rngs={"dropout": rngs[1]}
        )
        if compute_dtype is not None:
            out = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.float32)
                if t.dtype == compute_dtype
                else t,
                out,
            )
        losses, new_cum = pairnet_loss(
            out, bt, rngs[0], st.cum_samples, **loss_cfg
        )
        return losses["loss_total"]

    def loss_only(st, bt):
        rngs = jax.random.split(st.rng, 2)
        return st, _loss(st, st.params["params"], bt, rngs)

    def loss_and_grad(st, bt):
        rngs = jax.random.split(st.rng, 2)
        loss, grads = jax.value_and_grad(
            lambda p: _loss(st, p, bt, rngs)
        )(st.params["params"])
        gsum = sum(
            jnp.sum(jnp.abs(g).astype(jnp.float32))
            for g in jax.tree_util.tree_leaves(grads)
        )
        return st, loss + 0.0 * gsum  # consume grads: no backward DCE

    step = make_train_step(model, tx, loss_cfg, compute_dtype=compute_dtype)

    def full_step(st, bt):
        st2, metrics = step(st, bt)
        return st2, metrics["loss_total"]

    timed(loss_only, state, batch, args.iters, "fwd + targets + loss")
    timed(loss_and_grad, state, batch, args.iters, "fwd + loss + backward")
    timed(full_step, state, batch, args.iters, "full step (+clip + AdamW)")


if __name__ == "__main__":
    main()
