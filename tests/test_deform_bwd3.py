"""bf16 pair-packed deform-attn backward (bwd3): parity vs bwd2.

On bf16-representable values the packed gather is exact, so dlocs/dweights
must match bwd2 to f32-reassociation tolerance; dvalue additionally
carries the upstream grad's bf16 rounding (~2^-8 relative), bounded here
against the bf16-rounded bwd2 recomputation.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_deform_bwd2 import _ms_deform_attn_bwd2_impl
from pairnet_tpu.ops.pallas_deform_bwd3 import _ms_deform_attn_bwd3_impl


def _inputs(seed=0, wild=False):
    rng = np.random.default_rng(seed)
    shapes = ((20, 30), (10, 15), (5, 8))
    B, H, D, Q, P = 2, 4, 32, 700, 4
    lo, hi = (-0.6, 1.6) if wild else (-0.1, 1.1)
    S = sum(h * w for h, w in shapes)
    # bf16-representable values/grads: the packed path is then exact
    value = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    value = value.astype(jnp.bfloat16).astype(jnp.float32)
    locs = rng.uniform(lo, hi, size=(B, Q, H, 3, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, 3, P)).astype(np.float32)
    g = rng.normal(size=(B, Q, H * D)).astype(np.float32)
    g = jnp.asarray(g).astype(jnp.bfloat16).astype(jnp.float32)
    return shapes, value, jnp.asarray(locs), jnp.asarray(w), g


@pytest.mark.parametrize("wild", [False, True])
def test_bwd3_matches_bwd2_on_bf16_values(wild):
    shapes, value, locs, w, g = _inputs(seed=3, wild=wild)
    with pltpu.force_tpu_interpret_mode():
        ref = _ms_deform_attn_bwd2_impl(value, shapes, locs, w, g)
        got = _ms_deform_attn_bwd3_impl(value, shapes, locs, w, g)
    names = ("dvalue", "dlocs", "dweights")
    # dvalue: bwd3 rounds (g * w) to bf16 before the one-hot matmul;
    # dlocs/dweights: gather exact on bf16 values, f32 reduce — only
    # reassociation noise
    tols = {"dvalue": 1e-2, "dlocs": 2e-5, "dweights": 2e-5}
    for name, a, b in zip(names, ref, got):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b, a, atol=tols[name] * scale, err_msg=f"{name} wild={wild}"
        )
