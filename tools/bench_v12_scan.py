#!/usr/bin/env python
"""Scan-amortized v12 deform-attn split: full op vs raw kernel vs prep.

bench_deform_v12_parts.py times one op per dispatch; the tunneled runtime's
~3 ms per-dispatch overhead is comparable to the op itself, so this variant
repeats each piece REPS times inside one jit (inputs perturbed per rep so
XLA cannot CSE the calls; outputs fully reduced so nothing is sliced away).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "cpu" not in os.environ.get("JAX_PLATFORMS", ""):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pairnet_jax_cache")

REPS = int(os.environ.get("BENCH_REPS", "8"))


def timed(op, args, iters=4, name=""):
    """op: (*args) -> scalar f32. args[0] is perturbed per rep."""
    import jax
    import jax.numpy as jnp

    def chained(a0, rest):
        def body(c, _):
            s = op(c, *rest)
            return c + (1e-20 * s).astype(c.dtype), s

        c, ss = jax.lax.scan(body, a0, None, length=REPS)
        return c, jnp.sum(ss)

    cfn = jax.jit(chained)
    a0, rest = args[0], args[1:]
    c, s = cfn(a0, rest)
    _ = float(s)
    t0 = time.perf_counter()
    for _i in range(iters):
        c, s = cfn(c, rest)
    _ = float(s)
    dt = (time.perf_counter() - t0) / (iters * REPS) * 1000
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
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

    import pairnet_tpu.ops.pallas_deform_attn_v14 as v14

    # (1) full op, perturb value
    timed(
        lambda v, l, w: jnp.sum(
            v12._ms_deform_attn_v12_impl(v, shapes, l, w).astype(jnp.float32)
        ),
        (value, locs, aw),
        name="v12 full op",
    )
    timed(
        lambda v, l, w: jnp.sum(
            v14._ms_deform_attn_v14_impl(v, shapes, l, w).astype(jnp.float32)
        ),
        (value, locs, aw),
        name="v14 full op (select-merge)",
    )

    # stage inputs once (outside timing)
    def prep(value, locs, weights):
        # mirror of _ms_deform_attn_v12_impl's prep, returning staged tensors
        from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up

        B, S, H, D = value.shape
        Q = locs.shape[1]
        P = locs.shape[4]
        BLK, TQ = v12.BLK, v12.TQ
        offs_ = [0]
        for h, w in shapes:
            offs_.append(offs_[-1] + h * w)
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
        planes_raw, scales_l, lvl_offs, s_pads = [], [], [], []
        xs, ys, aws, bases_l, counts_l = [], [], [], [], []
        pos = 0
        for lvl, (h, w) in enumerate(shapes):
            S_l = h * w
            S_pad_l = _round_up(S_l + BLK, BLK)
            vl = jax.lax.dynamic_slice_in_dim(vT, offs_[lvl], S_l, axis=2)
            scale = jnp.maximum(
                jnp.max(jnp.abs(vl.astype(jnp.float32)), axis=2, keepdims=True)
                / 127.0,
                1e-20,
            )
            planes_raw.append(jnp.pad(vl, ((0, 0), (0, 0), (0, S_pad_l - S_l))))
            scales_l.append(scale)
            lvl_offs.append(pos)
            s_pads.append(S_pad_l)
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
        vraw = jnp.concatenate(planes_raw, axis=2)
        scales_dl = jnp.concatenate(scales_l, axis=2)
        vp = v12._quantize_pack_fused(
            vraw, scales_dl, tuple(shapes), tuple(lvl_offs), tuple(s_pads)
        )
        scales = scales_dl.transpose(0, 2, 1)
        xg = jnp.concatenate(xs, axis=1)
        yg = jnp.concatenate(ys, axis=1)
        ag = jnp.concatenate(aws, axis=1)
        bases = jnp.concatenate(bases_l, axis=2)
        counts = jnp.concatenate(counts_l, axis=2)
        return vp, scales, xg, yg, ag, bases, counts, tuple(lvl_offs)

    staged = jax.jit(lambda v, l, w: prep(v, l, w)[:-1])(value, locs, aw)
    lvl_offs = jax.jit(lambda v, l, w: 0)(value, locs, aw)  # warm nothing
    from pairnet_tpu.ops.pallas_deform_attn_v6 import _round_up as _ru

    lvl_offs, pos = [], 0
    for h, w in shapes:
        lvl_offs.append(pos)
        pos += _ru(h * w + v12.BLK, v12.BLK)
    lvl_offs = tuple(lvl_offs)
    vp, scales, xg, yg, ag, bases, counts = staged

    # (2) raw kernel, perturb xg (f32 coords; 1e-20 shift is numerically nil)
    timed(
        lambda x_, vp_, s_, y_, a_, b_, c_: jnp.sum(
            v12._weighted_gather_v12(
                vp_, s_, x_, y_, a_, b_, c_, shapes, lvl_offs
            ).astype(jnp.float32)
        ),
        (xg, vp, scales, yg, ag, bases, counts),
        name="v12 raw pallas kernel (staged inputs)",
    )
    timed(
        lambda x_, vp_, s_, y_, a_, b_, c_: jnp.sum(
            v14._weighted_gather_v14(
                vp_, s_, x_, y_, a_, b_, c_, shapes, lvl_offs
            ).astype(jnp.float32)
        ),
        (xg, vp, scales, yg, ag, bases, counts),
        name="v14 raw pallas kernel (staged inputs)",
    )

    # (3) prep only, perturb value; consume every staged tensor
    def prep_sum(v, l, w):
        vp, scales, xg, yg, ag, bases, counts, _ = prep(v, l, w)
        return (
            jnp.sum(vp, dtype=jnp.int64).astype(jnp.float32)
            + jnp.sum(xg) + jnp.sum(yg) + jnp.sum(ag)
            + jnp.sum(scales)
            + jnp.sum(bases).astype(jnp.float32)
            + jnp.sum(counts).astype(jnp.float32)
        )

    timed(prep_sum, (value, locs, aw), name="v12 prep only (kernel absent)")

    # (3b) quantize+pack kernel alone, perturb raw plane
    BH = B * H
    S_pad = vp.shape[2]
    vraw = jax.random.normal(jax.random.PRNGKey(3), (BH, D, S_pad), jnp.bfloat16)
    scales_dl = jnp.maximum(
        jnp.max(jnp.abs(vraw.astype(jnp.float32)), 2, keepdims=True) / 127.0, 1e-20
    )
    scales_dl = jnp.concatenate([scales_dl] * L, axis=2)
    s_pads = []
    for h, w in shapes:
        s_pads.append(_ru(h * w + v12.BLK, v12.BLK))
    timed(
        lambda v_, s_: jnp.sum(
            v12._quantize_pack_fused(
                v_, s_, tuple(shapes), lvl_offs, tuple(s_pads)
            ),
            dtype=jnp.int64,
        ).astype(jnp.float32),
        (vraw, scales_dl),
        name="quantize+pack kernel alone",
    )


if __name__ == "__main__":
    main()
