"""Fused masked cross-attention: interpret-mode parity vs the XLA path."""

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from pairnet_tpu.ops.pallas_masked_attn import ST, masked_flash_attention


def _reference(q, k, v, mask_b):
    """The MultiheadAttention einsum path (f32 softmax, -1e9 masking)."""
    D = q.shape[-1]
    logits = jnp.einsum("nqd,nkd->nqk", q, k).astype(jnp.float32) / math.sqrt(D)
    logits = jnp.where(mask_b, -1e9, logits)
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", attn, v.astype(jnp.float32))


def test_masked_flash_matches_xla():
    rng = np.random.default_rng(0)
    B, H, Lq, Lk, D = 2, 4, 104, 2 * ST, 32
    q = jnp.asarray(rng.normal(size=(B * H, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B * H, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B * H, Lk, D)), jnp.float32)
    mask = rng.uniform(size=(B, Lq, Lk)) < 0.6
    # some all-masked rows (the decoder resets those upstream, but the
    # kernel must still return finite values)
    mask[:, 7] = True
    mask = jnp.asarray(mask, jnp.int8)

    mask_bh = jnp.repeat(mask.astype(bool), H, axis=0)
    ref = _reference(q, k, v, mask_bh)
    with pltpu.force_tpu_interpret_mode():
        out = masked_flash_attention(q, k, v, mask, H)
    out = np.asarray(out)
    refn = np.asarray(ref)
    assert np.isfinite(out).all()
    # all-masked rows: reference gives uniform attention over -1e9 logits
    # (exp(0)/Lk each) — the kernel's online softmax matches that too
    np.testing.assert_allclose(out, refn, atol=2e-5, rtol=2e-5)


def test_masked_flash_head_shared_mask():
    """The mask block is indexed b // H — all heads of one image share it."""
    rng = np.random.default_rng(1)
    B, H, Lq, Lk, D = 2, 2, 8, ST, 16
    q = jnp.asarray(rng.normal(size=(B * H, Lq, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B * H, Lk, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B * H, Lk, D)), jnp.float32)
    # image 0 masks the first half of tokens, image 1 the second half
    mask = np.zeros((B, Lq, Lk), np.int8)
    mask[0, :, : Lk // 2] = 1
    mask[1, :, Lk // 2 :] = 1
    with pltpu.force_tpu_interpret_mode():
        out = masked_flash_attention(q, k, v, jnp.asarray(mask), H)
    ref = _reference(
        q, k, v, jnp.repeat(jnp.asarray(mask, bool), H, axis=0)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
