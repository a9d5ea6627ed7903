"""v12 fused-level deform-attn kernel: interpret-mode parity tests.

v12 shares v11's quantization, windows, and scan order; it fuses the three
per-level kernels into one, folds the int8 row scale in-kernel, and emits
bf16. The f32 accumulation order (taps in block order per group, levels
0+1+2) is identical, so v12 must equal bf16(v11) EXACTLY.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v11 as v11
import pairnet_tpu.ops.pallas_deform_attn_v12 as v12
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
def test_v12_is_bf16_of_v11(wild):
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    with pltpu.force_tpu_interpret_mode():
        a = v11._ms_deform_attn_v11_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
        b = v12._ms_deform_attn_v12_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    a16 = np.asarray(a.astype(jnp.bfloat16).astype(jnp.float32))
    b32 = np.asarray(b.astype(jnp.float32))
    np.testing.assert_array_equal(a16, b32)


def test_v12_int8_error_bounded():
    """End-to-end error vs the f32 reference stays at int8+bf16 scale."""
    shapes, value, locs, w = _inputs(seed=3)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v12._ms_deform_attn_v12_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    err = np.abs(np.asarray(ref) - np.asarray(out, np.float32))
    assert err.max() < 0.09, err.max()
    assert err.mean() < 0.012, err.mean()
