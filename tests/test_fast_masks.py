"""Parity of the serving fast-mask route in the Mask2Former decoder.

``attn_mask_small`` replaces the reference per-layer full-resolution mask
einsum + logit downscale (ref pairnet/models/relation_heads/pairnet_head.py:
247-258) with resize-then-contract: bilinear resize is linear in the mask
features, so ``resize(embed . mf) == embed . resize(mf)`` exactly in real
arithmetic — the two routes may differ only by f32 reassociation.  This
test drives the decoder end-to-end both ways and requires identical final
outputs (the boolean attention masks must match bit-for-bit at every layer
for that to hold, so it transitively checks the thresholded masks too).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.models.decoders import mask2former_decoder as m2f


def _build():
    dec = m2f.Mask2FormerDecoder(
        num_classes=7,
        num_queries=8,
        embed_dims=32,
        num_heads=4,
        num_layers=3,
        num_feat_levels=3,
        feedforward_channels=64,
        out_channels=32,
        return_intermediate=False,
    )
    rng = np.random.default_rng(0)
    B, h4, w4, C = 2, 16, 24, 32
    feats = [
        jnp.asarray(rng.normal(size=(B, h4 // s, w4 // s, C)), jnp.float32)
        for s in (8, 4, 2)  # low -> high res
    ]
    pos = [jnp.zeros((1,) + f.shape[1:], jnp.float32) for f in feats]
    mf = jnp.asarray(rng.normal(size=(B, h4, w4, C)), jnp.float32)
    params = dec.init(jax.random.PRNGKey(1), feats, mf, pos)
    return dec, params, feats, mf, pos


@pytest.mark.parametrize("fast", [False, True])
def test_fast_masks_parity(monkeypatch, fast):
    dec, params, feats, mf, pos = _build()
    monkeypatch.setattr(m2f, "_FAST_MASKS", fast)
    out = dec.apply(params, feats, mf, pos)
    # reference route is the pinned oracle; compare the fast route to it
    monkeypatch.setattr(m2f, "_FAST_MASKS", False)
    ref = dec.apply(params, feats, mf, pos)
    np.testing.assert_allclose(
        np.asarray(out["cls"]), np.asarray(ref["cls"]), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["mask"]), np.asarray(ref["mask"]), rtol=0, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["queries"]), np.asarray(ref["queries"]),
        rtol=0, atol=2e-5,
    )


def test_fast_masks_disabled_when_intermediates_needed(monkeypatch):
    """Training (return_intermediate=True) must keep the reference route:
    per-layer mask losses consume the full-resolution intermediates."""
    dec, params, feats, mf, pos = _build()
    dec = dec.clone(return_intermediate=True)
    params = dec.init(jax.random.PRNGKey(1), feats, mf, pos)
    monkeypatch.setattr(m2f, "_FAST_MASKS", True)
    out = dec.apply(params, feats, mf, pos)
    assert len(out["intermediates"]) == dec.num_layers
