"""v7 packed-pair deform-attn kernel: interpret-mode parity tests.

v7 packs the value plane to bf16 pairs, so parity is checked against the
row-gather reference evaluated on bf16-rounded values (identical products:
the packed halves ARE the bf16 values, all weighting stays f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v7 as v7
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
def test_v7_matches_rows_on_bf16_values(wild):
    """Parity vs the row-gather reference fed the same bf16 values,
    including far-flung multi-block sampling locations and the x0 == -1
    pair-clamp edge (wild range drives taps past every border)."""
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    vb = jnp.asarray(value).astype(jnp.bfloat16).astype(jnp.float32)
    ref = ms_deform_attn(
        vb, shapes, jnp.asarray(locs), jnp.asarray(w), impl="rows"
    )
    with pltpu.force_tpu_interpret_mode():
        out = v7._ms_deform_attn_v7_impl(
            jnp.asarray(value).astype(jnp.bfloat16),
            shapes,
            jnp.asarray(locs),
            jnp.asarray(w),
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_v7_matches_v6_exactly_on_bf16():
    """Same bf16 input -> v7's packed halves are bit-identical to v6's
    gathered values; outputs must agree to f32 roundoff."""
    import pairnet_tpu.ops.pallas_deform_attn_v6 as v6

    shapes, value, locs, w = _inputs(seed=3)
    vb = jnp.asarray(value).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        o6 = v6._ms_deform_attn_v6_impl(vb, shapes, jnp.asarray(locs), jnp.asarray(w))
        o7 = v7._ms_deform_attn_v7_impl(vb, shapes, jnp.asarray(locs), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(o6), np.asarray(o7), atol=1e-5)


def test_v7_encoder_geometry_q_equals_s():
    """Encoder self-attention geometry (Q == S, landscape levels — the
    shape the transposed pixel decoder feeds); parity vs the row-gather
    reference."""
    rng = np.random.default_rng(7)
    shapes = ((5, 8), (10, 16), (20, 32))
    B, H, D, P = 2, 4, 32, 4
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(-0.2, 1.2, size=(B, S, H, 3, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, S, H, 3, P)).astype(np.float32)
    vb = jnp.asarray(value).astype(jnp.bfloat16)
    ref = ms_deform_attn(
        vb.astype(jnp.float32), shapes, jnp.asarray(locs), jnp.asarray(w),
        impl="rows",
    )
    with pltpu.force_tpu_interpret_mode():
        out = v7._ms_deform_attn_v7_impl(
            vb, shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_v7_custom_vjp_grads_match_patch():
    """v7 reuses v6's backward kernel; gradients must match the XLA patch
    formulation's VJP for all three inputs (on bf16-rounded values)."""
    rng = np.random.default_rng(2)
    shapes = ((6, 8), (3, 4))
    S = sum(h * w for h, w in shapes)
    B, H, D, Q, P = 1, 2, 8, 40, 2
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    vb = value.astype(jnp.bfloat16).astype(jnp.float32)
    locs = jnp.asarray(rng.uniform(0, 1, size=(B, Q, H, 2, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)
    cot = jnp.asarray(rng.normal(size=(B, Q, H * D)), jnp.float32)

    def f_v7(v, l, ww):
        with pltpu.force_tpu_interpret_mode():
            return (
                v7.ms_deform_attn_pallas_v7(v.astype(jnp.bfloat16), shapes, l, ww)
                * cot
            ).sum()

    def f_patch(v, l, ww):
        return (ms_deform_attn(v, shapes, l, ww, impl="patch") * cot).sum()

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(f_v7, argnums=(0, 1, 2))(vb, locs, w)
    g2 = jax.grad(f_patch, argnums=(0, 1, 2))(vb, locs, w)
    # dvalue passes through the forward's bf16 cast (one bf16 rounding);
    # dlocs/dweights stay f32 end-to-end
    for a, b, atol in zip(g1, g2, (1e-2, 2e-4, 2e-4)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)
