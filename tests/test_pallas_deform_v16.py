"""v16 int4 pair-channel deform-attn kernel: interpret-mode parity tests.

v16 quantizes the value plane to int4 (per (BH, D, level) absmax/7) and
packs the 2x2 footprint of channel pairs (d, d + D/2) as eight nibbles per
int32 lane, halving the gather traffic of v14.  Parity is checked EXACTLY
against the row-gather reference evaluated on identically int4-dequantized
values (all weighting/accumulation is f32 in both), and BOUNDED against
the f32 reference (int4 rounding error only — ~16x int8's).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v16 as v16
from pairnet_tpu.ops.deform_attn import ms_deform_attn


def _inputs(seed=0, wild=False):
    rng = np.random.default_rng(seed)
    shapes = ((20, 30), (10, 15), (5, 8))
    B, H, D, Q, P = 2, 4, 32, 700, 4
    lo, hi = (-0.6, 1.6) if wild else (-0.1, 1.1)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(lo, hi, size=(B, Q, H, 3, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, 3, P)).astype(np.float32)
    return shapes, value, locs, w


def _int4_dequantized_reference(shapes, value, locs, w):
    """Row-gather reference on per-level int4-dequantized values."""
    B, S, H, D = value.shape
    offs = [0]
    for h_, w_ in shapes:
        offs.append(offs[-1] + h_ * w_)
    vdq = np.array(value, np.float32)
    for lvl in range(len(shapes)):
        sl = slice(offs[lvl], offs[lvl + 1])
        vl = vdq[:, sl].transpose(0, 2, 3, 1).reshape(B * H, D, -1)
        scale = np.maximum(np.abs(vl).max(axis=2, keepdims=True) / 7.0, 1e-20)
        # match the kernel exactly: f32 divide, round-half-even, clip
        q4 = np.clip(
            np.asarray(jnp.round(jnp.asarray(vl / scale))), -7, 7
        )
        vl = (q4 * scale).astype(np.float32)
        vdq[:, sl] = vl.reshape(B, H, D, -1).transpose(0, 3, 1, 2)
    return ms_deform_attn(
        jnp.asarray(vdq), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )


@pytest.mark.parametrize("wild", [False, True])
def test_v16_matches_rows_on_dequantized_values(wild):
    """Exact parity vs the reference fed the same int4-dequantized values,
    including far-flung multi-block taps and every border-clamp edge."""
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    ref = _int4_dequantized_reference(shapes, value, locs, w)
    with pltpu.force_tpu_interpret_mode():
        out = v16._ms_deform_attn_v16_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out, np.float32), atol=2e-2, rtol=1e-3
    )


def test_v16_int4_error_bounded():
    """End-to-end error vs the f32 reference stays at int4-rounding scale."""
    shapes, value, locs, w = _inputs(seed=3)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v16._ms_deform_attn_v16_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    err = np.abs(np.asarray(ref) - np.asarray(out, np.float32))
    # values ~N(0,1): row absmax ~4 -> int4 lsb ~4/7/2; each output
    # averages ~12 incoherently-rounded taps
    assert err.max() < 1.2, err.max()
    assert err.mean() < 0.16, err.mean()


def test_v16_grads_flow_through_custom_vjp():
    shapes, value, locs, w = _inputs(seed=5)

    def f(v, l, ww):
        return v16.ms_deform_attn_pallas_v16(v, shapes, l, ww).sum()

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f, argnums=(0, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
        )
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert np.abs(np.asarray(g[0])).max() > 0
