"""v9 point-major-group deform-attn kernel: interpret-mode parity tests.

v8 must be bit-identical to v7 (the lax.cond skips only all-zero
contributions); parity is vs the row-gather reference on bf16 values, same
as v7's suite.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

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
def test_v8_matches_rows_on_bf16_values(wild):
    shapes, value, locs, w = _inputs(seed=1, wild=wild)
    vb = jnp.asarray(value).astype(jnp.bfloat16).astype(jnp.float32)
    ref = ms_deform_attn(
        vb, shapes, jnp.asarray(locs), jnp.asarray(w), impl="rows"
    )
    with pltpu.force_tpu_interpret_mode():
        got = ms_deform_attn(
            jnp.asarray(value).astype(jnp.bfloat16), shapes,
            jnp.asarray(locs), jnp.asarray(w), impl="pallas_v9",
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
