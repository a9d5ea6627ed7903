"""v14 select-merge deform-attn kernel: interpret-mode parity tests.

v14 restructures v12's block-visit loop to select-merge raw packed words
(one select per visit) and defer byte extraction / weighting / reduction to
one post-loop pass per (level, group). Every arithmetic term is unchanged —
v12's per-visit masked additions only ever add exact f32 zeros — so v14
must equal v12 BIT-FOR-BIT, including on wild offsets where group windows
diverge and the UNROLL-rounded extra visit exercises the out-of-window
masking.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v12 as v12
import pairnet_tpu.ops.pallas_deform_attn_v14 as v14
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
def test_v14_equals_v12_exactly(wild):
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    with pltpu.force_tpu_interpret_mode():
        a = v12._ms_deform_attn_v12_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
        b = v14._ms_deform_attn_v14_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_v14_int8_error_bounded():
    """End-to-end error vs the f32 reference stays at int8+bf16 scale."""
    shapes, value, locs, w = _inputs(seed=3)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v14._ms_deform_attn_v14_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    err = np.abs(np.asarray(ref) - np.asarray(out, np.float32))
    assert err.max() < 0.09, err.max()
    assert err.mean() < 0.012, err.mean()


def test_v14_grads_flow_through_custom_vjp():
    import jax

    shapes, value, locs, w = _inputs(seed=5)

    def f(v, l, ww):
        return v14.ms_deform_attn_pallas_v14(v, shapes, l, ww).sum()

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(f, argnums=(0, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
        )
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()
    assert np.abs(np.asarray(g[0])).max() > 0
