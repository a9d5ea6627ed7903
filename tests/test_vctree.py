"""VCTree: greedy binary tree construction, TreeLSTM, head smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.twostage import SceneGraphTwoStage
from pairnet_tpu.models.heads.twostage.heads import twostage_loss
from pairnet_tpu.models.heads.twostage.vctree import (
    VCTreeHead,
    gen_vctree_binary,
    tree_depths,
    vctree_binary_loss,
)
from tests.test_twostage import NUM_CLASSES, NUM_PREDICATES, _head_kwargs, _twostage_batch


def test_gen_vctree_binary_chain():
    # scores strongly favor a chain 0-1-2-3 (directed, like the reference)
    s = np.full((5, 5), 0.01, np.float32)
    for a, b in ((0, 1), (1, 2), (2, 3)):
        s[a, b] = s[b, a] = 0.9
    valid = np.asarray([True] * 4 + [False])
    bl, br, bp = (
        np.asarray(t)
        for t in gen_vctree_binary(jnp.asarray(s), jnp.asarray(valid))
    )
    # invalid node never joins
    assert bp[4] == -1 and bl[4] == -1 and br[4] == -1
    # exactly one root among valid nodes, all others reachable
    roots = [i for i in range(4) if bp[i] == -1]
    assert len(roots) == 1
    d = np.asarray(tree_depths(jnp.asarray(bp)))
    assert d[:4].max() <= 3
    # binary pointers are consistent: each non-root is someone's left or
    # right child exactly once
    children = [int(x) for x in np.concatenate([bl[:4], br[:4]]) if x >= 0]
    assert sorted(children) == sorted(i for i in range(4) if bp[i] >= 0)


def test_gen_vctree_matches_reference_algorithm():
    """Cross-check vs a direct python transcription of the reference
    gen_tree + arbForest_to_biForest (vctree_util.py:15-135)."""
    rng = np.random.default_rng(3)
    N = 7
    s = rng.uniform(0.05, 0.95, size=(N, N)).astype(np.float32)
    valid = np.ones((N,), bool)

    # reference algorithm in python
    node_scores = s.mean(1)
    root = int(node_scores.argmax())
    selected = [root]
    remain = [i for i in range(N) if i != root]
    children: dict = {i: [] for i in range(N)}
    while remain:
        grid = s[np.asarray(selected)][:, np.asarray(remain)]
        flat = int(grid.reshape(-1).argmax())
        dep = selected[flat // len(remain)]
        ins = remain[flat % len(remain)]
        children[dep].append(ins)
        selected.append(ins)
        remain.remove(ins)
    bl_ref = np.full(N, -1)
    br_ref = np.full(N, -1)
    bp_ref = np.full(N, -1)
    for p in range(N):
        ch = children[p]
        if ch:
            bl_ref[p] = ch[0]
            bp_ref[ch[0]] = p
            for a, b in zip(ch, ch[1:]):
                br_ref[a] = b
                bp_ref[b] = a

    bl, br, bp = (
        np.asarray(t)
        for t in gen_vctree_binary(jnp.asarray(s), jnp.asarray(valid))
    )
    np.testing.assert_array_equal(bl, bl_ref)
    np.testing.assert_array_equal(br, br_ref)
    np.testing.assert_array_equal(bp, bp_ref)


def test_vctree_head_forward_loss():
    rng = np.random.default_rng(0)
    batch = _twostage_batch(rng)
    model = SceneGraphTwoStage(
        backbone=ResNet(depth=26, base_width=8),
        relation_head=VCTreeHead(**_head_kwargs()),
        neck_channels=32,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    def loss_fn(v):
        out = model.apply(v, batch)
        losses = twostage_loss(out, batch)
        losses["loss_tree"] = vctree_binary_loss(out["relatedness"], batch)
        total = losses["loss_total"] + losses["loss_tree"]
        return total, (out, losses)

    (total, (out, losses)), grads = jax.jit(
        lambda v: jax.value_and_grad(loss_fn, has_aux=True)(v)
    )(variables)
    B, N = batch["det_labels"].shape
    assert out["relatedness"].shape == (B, N, N)
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    g = jax.tree_util.tree_leaves(grads["params"]["relation_head"]["context_layer"])
    assert sum(float(jnp.abs(x).sum()) for x in g) > 0
