"""v10 quad-packed int8 deform-attn kernel: interpret-mode parity tests.

v10 quantizes the value plane to int8 (per (BH, D)-row absmax), so parity
is checked two ways: EXACT against the row-gather reference evaluated on
the identically-dequantized values (all weighting/accumulation is f32 in
both), and BOUNDED against the f32 reference (int8 rounding error only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v10 as v10
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


def _dequantized_reference(shapes, value, locs, w):
    """Row-gather reference on per-level int8-dequantized values."""
    B, S, H, D = value.shape
    offs = [0]
    for h_, w_ in shapes:
        offs.append(offs[-1] + h_ * w_)
    vdq = np.array(value, np.float32)
    for lvl, (h_, w_) in enumerate(shapes):
        sl = slice(offs[lvl], offs[lvl + 1])
        vl = vdq[:, sl].transpose(0, 2, 3, 1).reshape(B * H, D, h_ * w_)
        q8, scale = jax.device_get(v10._quantize_rows(jnp.asarray(vl)))
        vl = q8.astype(np.float32) * scale
        vdq[:, sl] = vl.reshape(B, H, D, h_ * w_).transpose(0, 3, 1, 2)
    return ms_deform_attn(
        jnp.asarray(vdq), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )


@pytest.mark.parametrize("wild", [False, True])
def test_v10_matches_rows_on_dequantized_values(wild):
    """Exact parity vs the reference fed the same int8-dequantized values,
    including far-flung multi-block taps and every border-clamp edge."""
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    ref = _dequantized_reference(shapes, value, locs, w)
    with pltpu.force_tpu_interpret_mode():
        out = v10._ms_deform_attn_v10_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(out), atol=2e-4, rtol=1e-4
    )


def test_v10_int8_error_bounded():
    """End-to-end error vs the f32 reference stays at int8-rounding scale."""
    shapes, value, locs, w = _inputs(seed=3)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v10._ms_deform_attn_v10_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    err = np.abs(np.asarray(ref) - np.asarray(out))
    # values ~N(0,1): row absmax ~4 -> lsb ~4/254; each output sums 12
    # taps of weight ~aw/12 each... keep a generous but meaningful bound
    assert err.max() < 0.08, err.max()
    assert err.mean() < 0.01, err.mean()


def test_v10_grads_flow_through_custom_vjp():
    """The custom VJP (v6 backward on full-precision inputs) produces
    finite nonzero grads for value, locs and weights."""
    rng = np.random.default_rng(5)
    shapes = ((10, 12), (5, 6))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 1, 2, 32, 128, 4
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    locs = jnp.asarray(
        rng.uniform(-0.2, 1.2, size=(B, Q, H, 2, P, 2)), jnp.float32
    )
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)

    def f(v, l, ww):
        return v10.ms_deform_attn_pallas_v10(v, shapes, l, ww).sum()

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    for t in g:
        assert np.isfinite(np.asarray(t)).all()
        assert np.abs(np.asarray(t)).max() > 0
