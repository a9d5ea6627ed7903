"""Parity of the serving fast-mask route in the Mask2Former decoder.

``attn_mask_small`` replaces the reference per-layer full-resolution mask
einsum + logit downscale (ref pairnet/models/relation_heads/pairnet_head.py:
247-258) with resize-then-contract: bilinear resize is linear in the mask
features, so ``resize(embed . mf) == embed . resize(mf)`` exactly in real
arithmetic — the two routes may differ only by f32 reassociation.  This
test drives the decoder end-to-end both ways and requires identical final
outputs.  That only holds if every thresholded boolean attention-mask bit
agrees, so the test first PROVES the fixture cannot flip a bit: at every
consumed mask it computes both routes' logits, bounds their difference,
and asserts the reference logits keep a margin from the sigmoid<0.5
decision boundary that is orders of magnitude wider than that difference
(ADVICE r4: a near-boundary logit could otherwise flake on a different
backend/XLA version).
"""

import jax
import jax.numpy as jnp
import numpy as np

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


def _logits_ref(dec, params, query, mf, hw):
    """Reference-route attention-mask logits (forward_head without the
    threshold): full-resolution einsum, then bilinear downscale."""

    def run(mdl, q, m):
        out = mdl.post_norm(q)
        me = mdl.mask_embed(out)
        mp = jnp.einsum(
            "bqc,bhwc->bqhw", me, m, preferred_element_type=jnp.float32
        )
        am = jnp.transpose(mp, (0, 2, 3, 1))
        am = m2f.bilinear_resize(am, hw)
        return am.reshape(am.shape[0], -1, am.shape[-1]).transpose(0, 2, 1)

    return dec.apply(params, query, mf, method=run)


def _logits_fast(dec, params, query, mf, hw):
    """Fast-route logits (attn_mask_small without the threshold):
    resize-then-contract."""

    def run(mdl, q, m):
        small = m2f.bilinear_resize(m, hw).reshape(
            m.shape[0], hw[0] * hw[1], -1
        )
        out = mdl.post_norm(q)
        me = mdl.mask_embed(out)
        return jnp.einsum(
            "bqc,bsc->bqs", me, small, preferred_element_type=jnp.float32
        )

    return dec.apply(params, query, mf, method=run)


def test_fast_masks_parity(monkeypatch):
    dec, params, feats, mf, pos = _build()
    shapes = [(f.shape[1], f.shape[2]) for f in feats]

    monkeypatch.setattr(m2f, "_FAST_MASKS", False)
    ref = dec.apply(params, feats, mf, pos)
    monkeypatch.setattr(m2f, "_FAST_MASKS", True)
    out = dec.apply(params, feats, mf, pos)

    # Guard before asserting parity: the boolean masks consumed at layer i
    # threshold the logits of the query AFTER layer i-1 (initial broadcast
    # query for layer 0).  By induction identical booleans -> identical
    # layer inputs -> bit-identical queries, so the reference run's query
    # history supplies every consumed query for BOTH routes.
    q0 = jnp.broadcast_to(
        params["params"]["query_feat"][None],
        (mf.shape[0], dec.num_queries, dec.embed_dims),
    )
    queries = [q0] + [ref["query_history"][i] for i in range(dec.num_layers - 1)]
    route_gap, margin = 0.0, np.inf
    for i, q in enumerate(queries):
        hw = shapes[i % len(shapes)]
        lr = np.asarray(_logits_ref(dec, params, q, mf, hw))
        lf = np.asarray(_logits_fast(dec, params, q, mf, hw))
        route_gap = max(route_gap, np.abs(lr - lf).max())
        margin = min(margin, np.abs(lr).min())
    # routes agree to reassociation noise AND the fixture keeps every logit
    # far enough from the decision boundary that no backend can flip a bit
    assert route_gap < 1e-4, route_gap
    assert margin > 100 * max(route_gap, 1e-6), (margin, route_gap)

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
