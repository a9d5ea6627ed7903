"""Sequence (spatial) parallelism for the deformable encoder.

SURVEY §5.7 maps sequence-sharding onto the pixel decoder's H*W token
axis: at 800x1344 the encoder runs 6 deformable-attention + FFN layers
over ~22k tokens — much larger than the 100-query instance decoder — so
for images beyond single-chip HBM (or latency floors) the token axis is
the natural model-parallel dimension.

Design (tpu-first, ref has no counterpart — DDP only, SURVEY §5.8):

* tokens / positional encodings / reference points are sharded
  ``P('data', 'model')`` — each device owns ``S / m`` queries of its
  data-parallel batch shard;
* inside each layer the VALUE projection runs on the local token shard,
  then ONE ``all_gather`` of the projected (B, S, H, D) plane rides ICI
  (``MSDeformAttention(seq_axis=...)``) — the deformable gather needs
  the full plane because a query may tap anywhere;
* offsets / attention-weight / output projections, LayerNorms and the
  FFN (the bulk of the matmul FLOPs) all stay ``1/m``-sized;
* the surrounding convolutional FPN stays data-parallel (halo exchange
  for 3x3 convs is not worth it at these sizes).

``sequence_parallel_encoder`` is the shard_map runner; parity with the
sequential encoder is exact (same math, same params) and tested on the
8-device CPU mesh in tests/test_spatial_parallel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def sequence_parallel_encoder(
    mesh: Mesh,
    layer,
    layer_params: list,
    tokens: jnp.ndarray,
    pos: jnp.ndarray,
    reference_points: jnp.ndarray,
    spatial_shapes,
    data_axis: str = "data",
    seq_axis: str = "model",
) -> jnp.ndarray:
    """Run a stack of deformable encoder layers with the token axis sharded.

    ``layer`` must be a ``DeformableEncoderLayer`` constructed with
    ``seq_axis=seq_axis``; ``layer_params`` is one params tree per layer
    (e.g. ``variables['params'][f'encoder_layer_{i}']``).  tokens (B, S, C),
    pos (B, S, C), reference_points (B, S, L, 2).  Returns (B, S, C) with
    identical values to the sequential stack.
    """
    B, S, C = tokens.shape
    m = mesh.shape[seq_axis]
    S_pad = _round_up(S, m)
    if S_pad != S:
        # padded queries compute garbage that is dropped on exit; they do
        # NOT pollute real queries (the value plane is sliced per level to
        # its true h*w inside ms_deform_attn, and attention reads only it)
        pad = ((0, 0), (0, S_pad - S), (0, 0))
        tokens = jnp.pad(tokens, pad)
        pos = jnp.pad(pos, pad)
        reference_points = jnp.pad(
            reference_points, ((0, 0), (0, S_pad - S), (0, 0), (0, 0))
        )

    tok_spec = P(data_axis, seq_axis, None)
    ref_spec = P(data_axis, seq_axis, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(tok_spec, tok_spec, ref_spec),
        out_specs=tok_spec,
        check_vma=False,
    )
    def run(tok, pos_l, ref_l):
        for p in layer_params:
            tok = layer.apply(
                {"params": p}, tok, pos_l, ref_l, spatial_shapes
            )
        return tok

    out = run(tokens, pos, reference_points)
    return out[:, :S]
