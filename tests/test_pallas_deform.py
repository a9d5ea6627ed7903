"""Pallas deformable-attention kernel: interpret-mode parity vs row gathers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn as pda
from pairnet_tpu.ops.deform_attn import ms_deform_attn


def test_pallas_matches_rows_interpret():
    rng = np.random.default_rng(0)
    shapes = ((20, 30), (10, 15), (5, 8))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 2, 4, 32, 700, 4
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(-0.1, 1.1, size=(B, Q, H, 3, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, 3, P)).astype(np.float32)

    ref = ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = pda.ms_deform_attn_pallas(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=5e-6)


def test_pallas_custom_vjp_grads_match_patch():
    rng = np.random.default_rng(1)
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 1, 2, 8, 40, 2
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    locs = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, 2, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)

    def f_pallas(v):
        with pltpu.force_tpu_interpret_mode():
            return pda.ms_deform_attn_pallas(v, shapes, locs, w).sum()

    def f_patch(v):
        return ms_deform_attn(v, shapes, locs, w, impl="patch").sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_pallas)(value)
    g2 = jax.grad(f_patch)(value)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5)
