"""v13 flat-coords deform-attn: interpret-mode parity vs the classic path.

v13 consumes RAW projection outputs and does softmax + pixel-coord math +
grouping + windows in-kernel. Parity target: softmax(XLA) + locs build +
the v12 kernel on the same inputs (identical quantization; the only
reassociation is the per-point group accumulation order, which sums the
same taps in the same block order — f32 adds of the four point accs happen
after the loop in both formulations... v12 accumulates (q32 x 4p) lanes
through one sel matmul, v13 sums four per-point (D, 128) accs then one
identity matmul; both reduce the same f32 tap partials, so results match
to f32 round-off of a 4-term re-bracketing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import pairnet_tpu.ops.pallas_deform_attn_v12 as v12
import pairnet_tpu.ops.pallas_deform_attn_v13 as v13


def _inputs(seed=0, wild=False, swap=False):
    rng = np.random.default_rng(seed)
    shapes = ((20, 30), (10, 15), (5, 8))
    B, H, D, Q, P, L = 2, 4, 32, 700, 4, 3
    value = rng.normal(size=(B, sum(h * w for h, w in shapes), H, D)).astype(
        np.float32
    )
    scale = 8.0 if wild else 2.0
    offsets = (rng.normal(size=(B, Q, H * L * P * 2)) * scale).astype(np.float32)
    attn = rng.normal(size=(B, Q, H * L * P)).astype(np.float32)
    ref = rng.uniform(0.02, 0.98, size=(Q, 2)).astype(np.float32)
    return shapes, value, offsets, attn, ref, (B, H, D, Q, P, L), swap


def _classic_locs(shapes, offsets, attn, ref, dims, swap):
    """Rebuild (locs, weights) exactly as MSDeformAttention's slow path."""
    B, H, D, Q, P, L = dims
    off = offsets.reshape(B, Q, H, L, P, 2)
    if swap:
        off = off[..., ::-1]
    normalizer = np.asarray([[w, h] for h, w in shapes], np.float32)
    locs = ref[None, :, None, None, None, :] + off / normalizer[
        None, None, None, :, None, :
    ]
    aw = jax.nn.softmax(jnp.asarray(attn.reshape(B, Q, H, L * P)), axis=-1)
    return jnp.asarray(locs), aw.reshape(B, Q, H, L, P)


@pytest.mark.parametrize("wild,swap", [(False, False), (True, True)])
def test_v13_matches_classic_v12(wild, swap):
    shapes, value, offsets, attn, ref, dims, swap = _inputs(
        seed=1, wild=wild, swap=swap
    )
    locs, aw = _classic_locs(shapes, offsets, attn, ref, dims, swap)
    with pltpu.force_tpu_interpret_mode():
        a = v12._ms_deform_attn_v12_impl(
            jnp.asarray(value), shapes, locs, aw
        )
        b = v13.ms_deform_attn_flat(
            jnp.asarray(value),
            shapes,
            jnp.asarray(offsets),
            jnp.asarray(attn),
            jnp.asarray(ref),
            swap_offset_xy=swap,
        )
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    # identical quantization + tap weights; only a 4-term f32 re-bracketing
    # and the independent in-kernel coord math separate the two -> bf16-out
    # tolerance
    np.testing.assert_allclose(a32, b32, atol=2e-2, rtol=2e-2)
    # and the overwhelming majority must be bit-identical after bf16
    frac_equal = np.mean(a32 == b32)
    assert frac_equal > 0.97, frac_equal
