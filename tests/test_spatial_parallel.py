"""Sequence-parallel deformable encoder: exact parity on the 8-device mesh.

SURVEY §5.7: the H*W token axis is the model-parallel dimension for the
pixel decoder's encoder.  The shard_map runner must reproduce the
sequential stack exactly (same params, same math — the only collective is
the all_gather of the projected value plane).
"""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.layers import encoder_reference_points
from pairnet_tpu.models.necks.pixel_decoder import DeformableEncoderLayer
from pairnet_tpu.parallel.mesh import make_mesh
from pairnet_tpu.parallel.spatial import sequence_parallel_encoder


def _setup(n_layers=2):
    shapes = ((8, 12), (4, 6), (2, 3))
    S = sum(h * w for h, w in shapes)  # 126: NOT divisible by 4 (pad path)
    B, C = 2, 32
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(B, S, C)), jnp.float32) * 0.1
    ref = encoder_reference_points(shapes)
    ref = jnp.broadcast_to(ref[None], (B, *ref.shape))
    layer_seq = DeformableEncoderLayer(C, 4, 3, 2, 64)
    params = []
    for i in range(n_layers):
        v = layer_seq.init(jax.random.PRNGKey(i), tokens, pos, ref, shapes)
        params.append(v["params"])
    return shapes, tokens, pos, ref, layer_seq, params


def test_sequence_parallel_matches_sequential():
    shapes, tokens, pos, ref, layer_seq, params = _setup()
    expect = tokens
    for p in params:
        expect = layer_seq.apply({"params": p}, expect, pos, ref, shapes)

    mesh = make_mesh(n_data=2, n_model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    layer_sp = DeformableEncoderLayer(32, 4, 3, 2, 64, seq_axis="model")
    out = jax.jit(
        lambda t, po, r: sequence_parallel_encoder(
            mesh, layer_sp, params, t, po, r, shapes
        )
    )(tokens, pos, ref)
    np.testing.assert_allclose(
        np.asarray(expect), np.asarray(out), atol=2e-5, rtol=1e-5
    )


def test_sequence_parallel_grads_match():
    """Backward through the collective (psum of value-proj grads) agrees
    with the sequential stack's grads."""
    shapes, tokens, pos, ref, layer_seq, params = _setup(n_layers=1)
    mesh = make_mesh(n_data=2, n_model=4)
    layer_sp = DeformableEncoderLayer(32, 4, 3, 2, 64, seq_axis="model")

    def loss_seq(p):
        out = layer_seq.apply({"params": p}, tokens, pos, ref, shapes)
        return (out * out).mean()

    def loss_sp(p):
        out = sequence_parallel_encoder(
            mesh, layer_sp, [p], tokens, pos, ref, shapes
        )
        return (out * out).mean()

    g1 = jax.grad(loss_seq)(params[0])
    g2 = jax.jit(jax.grad(loss_sp))(params[0])
    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(g2))
    for path, a in flat1:
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(flat2[path]), atol=5e-5, rtol=1e-4,
            err_msg=str(path),
        )
