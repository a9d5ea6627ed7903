"""Swin backbone shapes + visualization + rel_random_crop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.data.pipeline import rel_random_crop
from pairnet_tpu.models.backbones.swin import SwinTransformer, _rel_pos_index
from pairnet_tpu.utils.visualize import render_panoptic, render_triplets


def test_swin_tiny_shapes():
    model = SwinTransformer(
        embed_dim=16, depths=(1, 1, 2, 1), num_heads=(1, 2, 4, 8), window=4
    )
    x = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    outs = jax.jit(model.apply)(params, x)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 16), (1, 8, 8, 32), (1, 4, 4, 64), (1, 2, 2, 128),
    ]
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_rel_pos_index_symmetry():
    idx = _rel_pos_index(3)
    assert idx.shape == (9, 9)
    assert idx[0, 0] == idx[4, 4]  # zero relative offset is shared
    assert idx.max() < 25  # (2*3-1)^2


def test_rel_random_crop_reindexes():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(40, 40, 3)).astype(np.uint8)
    masks = np.zeros((3, 40, 40), bool)
    masks[0, :10, :10] = True  # survives only left crops
    masks[1, 20:30, 20:30] = True
    masks[2, 35:, 35:] = True
    labels = np.asarray([5, 6, 7])
    rels = np.asarray([[0, 1, 2], [1, 2, 3]], np.int32)

    # crop away instance 0: region [10:40, 10:40]
    out = rel_random_crop(
        img[10:, 10:], masks[:, 10:, 10:], labels, rels, (30, 30),
        np.random.default_rng(1),
    )
    assert out is not None
    img_c, masks_c, labels_c, rels_c = out
    assert len(labels_c) == 2  # instance 0 dropped
    assert labels_c.tolist() == [6, 7]
    # relation (1,2,3) re-indexed to (0,1,3)
    assert rels_c.tolist() == [[0, 1, 3]]


def test_render_triplets():
    img = np.zeros((16, 16, 3), np.uint8)
    masks = np.zeros((4, 16, 16), bool)
    masks[0, :8] = True
    masks[2, 8:] = True
    labels = np.asarray([1, 2, 2, 1])
    pairs = np.asarray([[0, 2], [1, 3]])
    out, lines = render_triplets(
        img, masks, labels, pairs,
        r_labels=np.asarray([1, 2]), r_scores=np.asarray([0.9, 0.1]),
        class_names=["cat", "dog"], predicate_names=["on", "under"],
        topk=2,
    )
    assert out.shape == img.shape
    assert lines[0].startswith("cat --on--> dog")
    pan = render_panoptic(img, np.zeros((16, 16), np.int64))
    assert pan.shape == img.shape


def test_swin_bf16_scores_close_to_f32():
    """The bf16-compute path writes attention scores in bf16 (halved HBM
    traffic); outputs must stay within bf16 rounding of the f32-exact
    path on the same (bf16-representable) inputs."""
    model = SwinTransformer(
        embed_dim=16, depths=(1, 1), num_heads=(1, 2), window=4,
        out_indices=(0, 1),
    )
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.normal(size=(1, 24, 28, 3)), jnp.float32)
    x32 = x32.astype(jnp.bfloat16).astype(jnp.float32)  # representable
    params = model.init(jax.random.PRNGKey(0), x32)
    ref = model.apply(params, x32)
    p16 = jax.tree_util.tree_map(
        lambda t: t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t,
        params,
    )
    got = model.apply(p16, x32.astype(jnp.bfloat16))
    for r, g in zip(ref, got):
        r = np.asarray(r)
        g = np.asarray(g, np.float32)
        scale = np.abs(r).max() + 1e-6
        assert np.abs(g - r).max() < 0.05 * scale
