#!/usr/bin/env python
"""Capture a jax.profiler device trace and print a per-op time table.

The phase/parts benches (profile_phases.py, bench_encoder_parts.py) bound
costs by ablation; this tool gets the ground truth: which XLA fusions /
Pallas kernels the device actually spends time in. Parses the xplane proto
with tensorflow's bundled proto module (no tensorboard UI needed).

Usage:
  python tools/trace_ops.py                 # one encoder layer (bf16, B4)
  python tools/trace_ops.py --what decoder  # full pixel decoder
  python tools/trace_ops.py --what model    # flagship forward
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def capture(fn, args, outdir):
    import jax

    # warm up (compile) outside the trace
    out = fn(*args)
    _ = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype("float32")
    _ = float(_)
    with jax.profiler.trace(outdir):
        for _i in range(3):
            out = fn(*args)
        x = jax.tree_util.tree_leaves(out)[0].reshape(-1)[0].astype("float32")
        _ = float(x)


def report(outdir, top=30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(outdir, "**/*.xplane.pb"), recursive=True))
    if not paths:
        print("no xplane found under", outdir)
        return
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    per_op = collections.Counter()
    total = 0.0
    for plane in space.planes:
        low = plane.name.lower()
        # device planes only (skip host threads / python tracer)
        if not ("tpu" in low or "device" in low or "/device:" in low) or "host" in low:
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines double-count
            if "step" in lname or "module" in lname:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # -> ms
                per_op[name] += dur
                total += dur
    n_iters = 3
    print(f"device op time total {total / n_iters:9.3f} ms/iter  ({paths[-1].split('/')[-1]})")
    for name, ms in per_op.most_common(top):
        print(f"{ms / n_iters:9.3f} ms  {100 * ms / total:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--what", default="layer", choices=["layer", "decoder", "model", "train"]
    )
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--outdir", default="/tmp/pairnet_trace")
    args = ap.parse_args()

    import shutil

    shutil.rmtree(args.outdir, ignore_errors=True)

    import jax
    import jax.numpy as jnp

    dtype = dict(bf16=jnp.bfloat16, f32=jnp.float32)[args.dtype]
    B = args.batch

    if args.what == "layer":
        from pairnet_tpu.models.layers import encoder_reference_points
        from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer

        shapes = ((168, 100), (84, 50), (42, 25))
        S = sum(h * w for h, w in shapes)
        C = 256
        tokens = jax.random.normal(jax.random.PRNGKey(0), (B, S, C), dtype)
        pos = jax.random.normal(jax.random.PRNGKey(1), (B, S, C), dtype)
        ref = encoder_reference_points(shapes)
        ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
        layer = DeformableEncoderLayer(C, 8, 3, 4, 1024, swap_offset_xy=True)
        variables = layer.init(jax.random.PRNGKey(2), tokens, pos, ref, shapes)
        variables = jax.tree_util.tree_map(
            lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t, variables
        )
        fn = jax.jit(lambda t: layer.apply(variables, t, pos, ref, shapes))
        capture(fn, (tokens,), args.outdir)
    elif args.what == "train":
        import numpy as np

        from __graft_entry__ import _flagship
        from pairnet_tpu.train.optim import build_optimizer
        from pairnet_tpu.train.trainer import TrainState, make_train_step

        model = _flagship()
        H, W, G, R = 800, 1344, 24, 40
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
                     rng.integers(1, 56, (B, R))], -1), jnp.int32),
            "rel_valid": jnp.asarray(np.ones((B, R), bool)),
        }
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        tx = build_optimizer(variables["params"])
        state = TrainState.create(variables, tx, 56)
        cdt = jnp.bfloat16 if args.dtype == "bf16" else None
        step = jax.jit(
            make_train_step(model, tx, {"num_points": 12544}, compute_dtype=cdt)
        )

        def fn(bt):
            st, metrics = step(state, bt)
            return metrics["loss_total"]

        capture(fn, (batch,), args.outdir)
        report(args.outdir, args.top)
        return
    else:
        from __graft_entry__ import _flagship

        model = _flagship()
        H, W = 800, 1344
        img = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 3), jnp.float32)
        variables = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        if dtype != jnp.float32:
            cast = lambda t: t.astype(dtype) if t.dtype == jnp.float32 else t
            variables = jax.tree_util.tree_map(cast, variables)
            img = img.astype(dtype)
        if args.what == "decoder":
            def run(v, x):
                def m_fn(m, i):
                    return m.bbox_head.pixel_decoder(m.backbone(i))
                return model.apply(v, x, method=m_fn)
            fn = jax.jit(run)
        else:
            fn = jax.jit(lambda v, x: model.apply(v, x))
        capture(lambda x: fn(variables, x), (img,), args.outdir)

    report(args.outdir, args.top)


if __name__ == "__main__":
    main()
