#!/usr/bin/env python
"""Split v12 deform-attn op time: raw pallas kernel vs XLA prep.

Times (1) the full fused-level op, (2) the raw pallas_call with pre-staged
(already packed/grouped) inputs, (3) prep-only (kernel replaced by a cheap
reduction of the staged tensors). Chained methodology per bench.py. The gap
(1) - (2) - (3) is fusion/overlap slack.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")


def timed(fn, args, touch, iters=8, name=""):
    import jax

    def chained(*a):
        out = fn(*a)
        a0 = a[0] + (0.001 * touch(out)).astype(a[0].dtype)
        return (a0,) + tuple(a[1:]), out

    cfn = jax.jit(chained)
    a, out = cfn(*args)
    _ = float(touch(out))
    a = args
    t0 = time.perf_counter()
    for _i in range(iters):
        a, out = cfn(*a)
    _ = float(touch(out))
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    import pairnet_tpu.ops.pallas_deform_attn_v12 as v12
    from pairnet_tpu.models.layers import encoder_reference_points

    B, H, D, P = int(os.environ.get("BENCH_BATCH", "4")), 8, 32, 4
    shapes = ((168, 100), (84, 50), (42, 25))
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    Q = S
    key = jax.random.PRNGKey(0)
    value = jax.random.normal(key, (B, S, H, D), jnp.bfloat16)
    ref = encoder_reference_points(shapes)  # (S, L, 2)
    offs = 2.0 * jax.random.normal(jax.random.PRNGKey(1), (B, Q, H, L, P, 2))
    norm = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    locs = (
        ref[None, :, None, :, None, :]
        + offs / norm[None, None, None, :, None, :]
    )
    aw = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(2), (B, Q, H, L * P)), -1
    ).reshape(B, Q, H, L, P)

    touch = lambda o: o.reshape(-1)[0].astype(jnp.float32)

    # (1) full op
    timed(
        lambda v, l, w: v12._ms_deform_attn_v12_impl(v, shapes, l, w),
        (value, locs, aw),
        touch,
        name="v12 full op",
    )

    # stage the prep outside the timed region by splitting the impl
    import functools

    def prep(value, locs, weights):
        # replicate _ms_deform_attn_v12_impl prep, return staged tensors
        B, S, H, D = value.shape
        Q = locs.shape[1]
        P = locs.shape[4]
        from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up
        from pairnet_tpu.ops.pallas_deform_attn_v10 import (
            _pack_quads,
            _quantize_rows,
        )

        offs_ = [0]
        for h, w in shapes:
            offs_.append(offs_[-1] + h * w)
        BLK = v12.BLK
        TQ = v12.TQ
        qpg = BLK // P
        Qp = _round_up(Q, TQ)
        nqt = Qp // TQ
        ng = TQ // qpg

        def to_groups(t):
            t = t.transpose(0, 2, 1, 3).reshape(B * H, Q, P)
            if Qp != Q:
                t = jnp.pad(t, ((0, 0), (0, Qp - Q), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        vT = (
            value.reshape(B, S, H * D)
            .transpose(2, 0, 1)
            .reshape(H, D, B, S)
            .transpose(2, 0, 1, 3)
            .reshape(B * H, D, S)
        )
        planes, scales_l, lvl_offs = [], [], []
        xs, ys, aws, bases_l, counts_l = [], [], [], [], []
        pos = 0
        for lvl, (h, w) in enumerate(shapes):
            S_l = h * w
            S_pad_l = _round_up(S_l + BLK, BLK)
            vl = jax.lax.dynamic_slice_in_dim(vT, offs_[lvl], S_l, axis=2)
            q8, scale = _quantize_rows(vl)
            planes.append(
                jnp.pad(_pack_quads(q8, w), ((0, 0), (0, 0), (0, S_pad_l - S_l)))
            )
            scales_l.append(scale.reshape(B * H, 1, D))
            lvl_offs.append(pos)
            pos += S_pad_l
            x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
            y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
            awl = weights[..., lvl, :].astype(jnp.float32)
            xb, yb, ab = to_groups(x), to_groups(y), to_groups(awl)
            y0 = jnp.floor(yb).astype(jnp.int32)
            x0 = jnp.floor(xb).astype(jnp.int32)
            flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
            lo_g = jnp.min(flat, axis=-1)
            hi_g = jnp.max(flat, axis=-1)
            bases = (lo_g // BLK * BLK).reshape(B * H, nqt, 1, ng) + lvl_offs[lvl]
            nblk = (hi_g.reshape(B * H, nqt, 1, ng) + lvl_offs[lvl] - bases) // BLK + 1
            xs.append(xb[:, None])
            ys.append(yb[:, None])
            aws.append(ab[:, None])
            bases_l.append(bases)
            counts_l.append(jnp.max(nblk, axis=-1))
        vp = jnp.concatenate(planes, axis=2)
        scales = jnp.concatenate(scales_l, axis=1)
        xg = jnp.concatenate(xs, axis=1)
        yg = jnp.concatenate(ys, axis=1)
        ag = jnp.concatenate(aws, axis=1)
        bases = jnp.concatenate(bases_l, axis=2)
        counts = jnp.concatenate(counts_l, axis=2)
        return vp, scales, xg, yg, ag, bases, counts

    staged = jax.jit(prep)(value, locs, aw)
    # static level offsets (padded plane layout)
    from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up as _ru
    lvl_offs, pos = [], 0
    for h, w in shapes:
        lvl_offs.append(pos)
        pos += _ru(h * w + v12.BLK, v12.BLK)
    lvl_offs = tuple(lvl_offs)
    staged = jax.tree_util.tree_map(
        lambda t: t if hasattr(t, "block_until_ready") else t, staged
    )
    vp, scales, xg, yg, ag, bases, counts = staged

    # (2) raw kernel on staged inputs
    timed(
        lambda vp_, s_, x_, y_, a_, b_, c_: v12._weighted_gather_v12(
            vp_, s_, x_, y_, a_, b_, c_, shapes, lvl_offs
        ),
        (vp, scales, xg, yg, ag, bases, counts),
        touch,
        name="v12 raw pallas kernel (staged inputs)",
    )

    # (3) prep only (kernel replaced by cheap reductions)
    def prep_only(value, locs, weights):
        vp, scales, xg, yg, ag, bases, counts = prep(value, locs, weights)
        return (
            jnp.sum(vp, axis=(1, 2), dtype=jnp.int32).astype(jnp.float32)
            + jnp.sum(xg, axis=(1, 2, 3))
            + jnp.sum(yg, axis=(1, 2, 3))
            + jnp.sum(ag, axis=(1, 2, 3))
            + jnp.sum(scales, axis=(1, 2))
            + jnp.sum(bases, axis=(1, 2, 3)).astype(jnp.float32)
            + jnp.sum(counts, axis=(1, 2)).astype(jnp.float32)
        )

    timed(prep_only, (value, locs, aw), touch, name="v12 prep only (kernel DCE'd)")


if __name__ == "__main__":
    main()
