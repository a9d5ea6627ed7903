"""VCTree: MST construction, TreeLSTM, head smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.twostage import SceneGraphTwoStage
from pairnet_tpu.models.heads.twostage.heads import twostage_loss
from pairnet_tpu.models.heads.twostage.vctree import (
    VCTreeHead,
    prim_mst,
    tree_depths,
    vctree_binary_loss,
)
from tests.test_twostage import NUM_CLASSES, NUM_PREDICATES, _head_kwargs, _twostage_batch


def test_prim_mst_chain():
    # scores strongly favor a chain 0-1-2-3
    s = np.full((5, 5), -10.0, np.float32)
    for a, b in ((0, 1), (1, 2), (2, 3)):
        s[a, b] = s[b, a] = 5.0
    valid = np.asarray([True] * 4 + [False])
    parent = np.asarray(prim_mst(jnp.asarray(s), jnp.asarray(valid)))
    assert parent[4] == -1  # invalid never joins
    roots = [i for i in range(4) if parent[i] == -1]
    assert len(roots) == 1
    # all valid nodes connected: depth reachable
    d = np.asarray(tree_depths(jnp.asarray(parent)))
    assert d[:4].max() <= 3
    edges = {(min(i, int(parent[i])), max(i, int(parent[i]))) for i in range(4) if parent[i] >= 0}
    assert edges == {(0, 1), (1, 2), (2, 3)}


def test_vctree_head_forward_loss():
    rng = np.random.default_rng(0)
    batch = _twostage_batch(rng)
    model = SceneGraphTwoStage(
        backbone=ResNet(depth=50, base_width=8),
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
