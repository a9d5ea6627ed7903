#!/usr/bin/env python
"""Split v10 deform-attn op time: raw pallas kernels vs XLA prep.

Times (1) the full 3-level op, (2) the three raw pallas_calls with
pre-staged (already packed/grouped) inputs, (3) prep-only (kernels replaced
by a cheap reduction of the staged tensors). Chained methodology per
bench.py. The gap (1) - (2) is the XLA-side cost: coordinate layout
shuffles, int8 quantize+pack, per-level output writes + scale folds.
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

    import pairnet_tpu.ops.pallas_deform_attn_v10 as v10
    from pairnet_tpu.models.layers import encoder_reference_points

    B, H, D, P = 4, 8, 32, 4
    shapes = ((168, 100), (84, 50), (42, 25))
    S = sum(h * w for h, w in shapes)

    v = jax.random.normal(jax.random.PRNGKey(3), (B, S, H, D), jnp.bfloat16)
    ref = encoder_reference_points(shapes)
    ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
    normalizer = jnp.asarray([[w, h] for h, w in shapes], jnp.float32)
    attn = jax.nn.softmax(
        jax.random.normal(jax.random.PRNGKey(5), (B, S, H, 3 * P)), axis=-1
    ).reshape(B, S, H, 3, P)
    offs = (
        jax.random.normal(jax.random.PRNGKey(4), (B, S, H, 3, P, 2)) * 2.0
    ) / normalizer[None, None, None, :, None, :]
    locs = ref[:, :, None, :, None, :] + offs

    touch = lambda o: o.reshape(-1)[0].astype(jnp.float32)
    timed(
        lambda vv: v10._ms_deform_attn_v10_impl(vv, shapes, locs, attn),
        (v,),
        touch,
        name="full v10 op (3 levels)",
    )

    # stage the per-level kernel inputs once, outside the timed region
    TQ, BLK = v10.TQ, v10.BLK
    offsets = [0]
    for h, w in shapes:
        offsets.append(offsets[-1] + h * w)
    qpg = BLK // P
    Qp = v10._round_up(S, TQ)
    staged = []
    for lvl, (h, w) in enumerate(shapes):
        S_l = h * w
        S_pad = v10._round_up(S_l + BLK, BLK)
        vl = jax.lax.dynamic_slice_in_dim(v, offsets[lvl], S_l, axis=1)
        vl = vl.transpose(0, 2, 3, 1).reshape(B * H, D, S_l)
        q8, scale = v10._quantize_rows(vl)
        vp = jnp.pad(v10._pack_quads(q8, w), ((0, 0), (0, 0), (0, S_pad - S_l)))
        x = locs[..., lvl, :, 0].astype(jnp.float32) * w - 0.5
        y = locs[..., lvl, :, 1].astype(jnp.float32) * h - 0.5
        aw = attn[..., lvl, :].astype(jnp.float32)

        def to_groups(t):
            t = t.transpose(0, 2, 1, 3).reshape(B * H, S, P)
            t = jnp.pad(t, ((0, 0), (0, Qp - S), (0, 0)))
            return t.reshape(B * H, Qp // qpg, qpg * P)

        xb, yb, ab = to_groups(x), to_groups(y), to_groups(aw)
        y0 = jnp.floor(yb).astype(jnp.int32)
        x0 = jnp.floor(xb).astype(jnp.int32)
        flat = jnp.clip(y0, 0, h - 1) * w + jnp.clip(x0, 0, w - 1)
        nqt = Qp // TQ
        lo = jnp.min(flat.reshape(B * H, nqt, TQ * P), axis=-1)
        hi = jnp.max(flat.reshape(B * H, nqt, TQ * P), axis=-1)
        base = lo // BLK * BLK
        nblk = (hi - base) // BLK + 1
        staged.append(
            tuple(map(jax.device_put, (vp, xb, yb, ab, base, nblk, scale)))
        )
        jax.block_until_ready(staged[-1])

    def raw_kernels(x0_in):
        out = None
        for lvl, (h, w) in enumerate(shapes):
            vp, xb, yb, ab, base, nblk, scale = staged[lvl]
            xb = xb + 0.0 * x0_in[0, 0, 0]  # keep chain dependency
            o = v10._weighted_gather_v10(vp, xb, yb, ab, base, nblk, h, w)
            o = o * scale.transpose(0, 2, 1)
            out = o if out is None else out + o
        return out

    timed(
        raw_kernels,
        (staged[0][1],),
        touch,
        name="raw pallas kernels + scale/sum (staged)",
    )

    def kernels_only(x0_in):
        out = None
        for lvl, (h, w) in enumerate(shapes):
            vp, xb, yb, ab, base, nblk, scale = staged[lvl]
            xb = xb + 0.0 * x0_in[0, 0, 0]
            o = v10._weighted_gather_v10(vp, xb, yb, ab, base, nblk, h, w)
            out = o if out is None else out + o
        return out

    timed(
        kernels_only,
        (staged[0][1],),
        touch,
        name="raw pallas kernels only (staged)",
    )


if __name__ == "__main__":
    main()
