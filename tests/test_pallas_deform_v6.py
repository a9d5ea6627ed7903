"""v6 LUT-block-gather deform-attn kernel: interpret-mode parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v6 as v6
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
def test_v6_matches_rows_interpret(wild):
    """Exact f32 parity incl. far-flung multi-block sampling locations."""
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v6._ms_deform_attn_v6_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_v6_custom_vjp_grads_match_patch():
    """The Pallas backward kernel (value scatter + bilinear chain rule)
    matches the XLA patch formulation's VJP for ALL THREE inputs."""
    rng = np.random.default_rng(2)
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 1, 2, 8, 40, 2
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    locs = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, 2, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Q, H * D)), jnp.float32)

    def f_v6(v, l, ww):
        with pltpu.force_tpu_interpret_mode():
            return (v6.ms_deform_attn_pallas_v6(v, shapes, l, ww) * cot).sum()

    def f_patch(v, l, ww):
        return (ms_deform_attn(v, shapes, l, ww, impl="patch") * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_v6, argnums=(0, 1, 2))(value, locs, w)
    g2 = jax.grad(f_patch, argnums=(0, 1, 2))(value, locs, w)
    for a, b, name in zip(g1, g2, ("dvalue", "dlocs", "dweights")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, err_msg=name
        )


def test_v6_grads_wild_offsets():
    """Backward stays exact for out-of-plane / multi-block taps."""
    rng = np.random.default_rng(5)
    shapes = ((20, 30), (10, 15), (5, 8))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 1, 2, 32, 200, 4
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    locs = jnp.asarray(
        rng.uniform(-0.6, 1.6, size=(B, Q, H, 3, P, 2)), jnp.float32
    )
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 3, P)), jnp.float32)

    def f_v6(v, l, ww):
        with pltpu.force_tpu_interpret_mode():
            return v6.ms_deform_attn_pallas_v6(v, shapes, l, ww).sum()

    def f_rows(v, l, ww):
        return ms_deform_attn(v, shapes, l, ww, impl="rows").sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_v6, argnums=(0, 1, 2))(value, locs, w)
    g2 = jax.grad(f_rows, argnums=(0, 1, 2))(value, locs, w)
    for a, b, name in zip(g1, g2, ("dvalue", "dlocs", "dweights")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, err_msg=name
        )
