"""v11 per-group-window deform-attn kernel: interpret-mode parity tests.

v11 shares v10's int8 quantization and lane layout; the only change is the
block scan (per-group windows inside a shared max-length loop). Parity is
therefore checked EXACTLY against v10 (bitwise-same math on the same
quantized values), plus the bounded check against the f32 reference, plus
a window-logic stress case with far-flung taps whose per-group windows and
the shared loop clamp diverge maximally.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v10 as v10
import pairnet_tpu.ops.pallas_deform_attn_v11 as v11
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


@pytest.mark.parametrize("wild", [False, True])
def test_v11_matches_v10_exactly(wild):
    """Same quantization, same weights — the scan-order change must be
    bitwise-neutral (f32 accumulation order within a tap set is identical:
    taps still accumulate in block order per group)."""
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    with pltpu.force_tpu_interpret_mode():
        a = v10._ms_deform_attn_v10_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
        b = v11._ms_deform_attn_v11_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_v11_int8_error_bounded():
    """End-to-end error vs the f32 reference stays at int8-rounding scale."""
    shapes, value, locs, w = _inputs(seed=3)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v11._ms_deform_attn_v11_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    err = np.abs(np.asarray(ref) - np.asarray(out))
    assert err.max() < 0.08, err.max()
    assert err.mean() < 0.01, err.mean()


def test_v11_divergent_group_windows():
    """Stress the shared max-loop + per-group base clamp: half the queries
    sample the far corner of level 0 (windows near the end of the plane),
    half sample the origin, interleaved so groups in one tile have wildly
    different bases and the count comes from the widest group."""
    rng = np.random.default_rng(7)
    shapes = ((40, 60), (20, 30), (10, 15))
    B, H, D, Q, P = 1, 2, 32, 512, 4
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = np.empty((B, Q, H, 3, P, 2), np.float32)
    # even queries: tight cluster at the origin; odd: spread over the
    # bottom-right quadrant (wide window, late base)
    locs[:, 0::2] = rng.uniform(0.0, 0.08, size=locs[:, 0::2].shape)
    locs[:, 1::2] = rng.uniform(0.55, 1.05, size=locs[:, 1::2].shape)
    w = rng.uniform(size=(B, Q, H, 3, P)).astype(np.float32)

    with pltpu.force_tpu_interpret_mode():
        a = v10._ms_deform_attn_v10_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
        b = v11._ms_deform_attn_v11_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
