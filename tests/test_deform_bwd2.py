"""Per-group-window deform-attn backward (bwd2): parity vs the v6 backward.

bwd2 reassociates only exact-zero masked adds and revisits dV blocks in a
different order, so gradients must match the v6 tile-union kernel to f32
reassociation tolerance on both tight and wild offsets (wild exercises
divergent per-group windows and the shared-max overshoot visits, including
the clamped zero-pad tail block).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_deform_attn_v6 import _ms_deform_attn_v6_bwd_impl
from pairnet_tpu.ops.pallas_deform_bwd2 import _ms_deform_attn_bwd2_impl


def _inputs(seed=0, wild=False):
    rng = np.random.default_rng(seed)
    shapes = ((20, 30), (10, 15), (5, 8))
    B, H, D, Q, P = 2, 4, 32, 700, 4
    lo, hi = (-0.6, 1.6) if wild else (-0.1, 1.1)
    S = sum(h * w for h, w in shapes)
    value = rng.normal(size=(B, S, H, D)).astype(np.float32)
    locs = rng.uniform(lo, hi, size=(B, Q, H, 3, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, H, 3, P)).astype(np.float32)
    g = rng.normal(size=(B, Q, H * D)).astype(np.float32)
    return shapes, value, locs, w, g


@pytest.mark.parametrize("wild", [False, True])
def test_bwd2_matches_v6_backward(wild):
    shapes, value, locs, w, g = _inputs(seed=2, wild=wild)
    with pltpu.force_tpu_interpret_mode():
        ref = _ms_deform_attn_v6_bwd_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            jnp.asarray(g),
        )
        got = _ms_deform_attn_bwd2_impl(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w),
            jnp.asarray(g),
        )
    names = ("dvalue", "dlocs", "dweights")
    for name, a, b in zip(names, ref, got):
        a = np.asarray(a)
        b = np.asarray(b)
        scale = np.abs(a).max() + 1e-6
        np.testing.assert_allclose(
            b, a, atol=2e-5 * scale, err_msg=f"{name} wild={wild}"
        )


def test_bwd2_is_default_vjp_path():
    """grad through the v14 custom VJP flows through bwd2 and is finite."""
    import os

    shapes, value, locs, w, g = _inputs(seed=5)
    from pairnet_tpu.ops.pallas_deform_attn_v14 import (
        ms_deform_attn_pallas_v14,
    )

    assert os.environ.get("PAIRNET_DEFORM_BWD", "v2") == "v2"

    def f(v, l, ww):
        return ms_deform_attn_pallas_v14(v, shapes, l, ww).sum()

    with pltpu.force_tpu_interpret_mode():
        grads = jax.grad(f, argnums=(0, 2))(
            jnp.asarray(value), jnp.asarray(locs), jnp.asarray(w)
        )
    for t in grads:
        assert np.isfinite(np.asarray(t)).all()
    assert np.abs(np.asarray(grads[0])).max() > 0
