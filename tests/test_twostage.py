"""Two-stage relation heads: MOTIFS / IMP / GPS-Net smoke tests (predcls)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pairnet_tpu.data.pipeline import collate, to_twostage_batch
from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.twostage import SceneGraphTwoStage
from pairnet_tpu.models.heads.twostage.core import (
    FrequencyBias,
    all_test_pairs,
    sample_train_pairs,
)
from pairnet_tpu.models.heads.twostage.heads import (
    GPSHead,
    IMPHead,
    MotifHead,
    twostage_loss,
    twostage_postprocess,
)
from tests.test_pairnet_model import _fake_batch

NUM_CLASSES = 8  # 7 fg + bg
NUM_PREDICATES = 6  # 5 + bg


def _twostage_batch(rng, max_pairs=12, train=True):
    raw = _fake_batch(rng)
    B = raw["image"].shape[0]
    samples = []
    for b in range(B):
        s = {k: np.asarray(v[b]) for k, v in raw.items()}
        s["gt_boxes"] = np.zeros((s["gt_labels"].shape[0], 4), np.float32)
        masks = s["gt_masks"]
        for g in range(masks.shape[0]):
            ys, xs = np.nonzero(masks[g])
            if len(ys):
                s["gt_boxes"][g] = [xs.min() * 4, ys.min() * 4,
                                    (xs.max() + 1) * 4, (ys.max() + 1) * 4]
        s["image_shape"] = np.asarray([64, 64], np.int32)
        samples.append(
            to_twostage_batch(s, max_pairs, train, np.random.default_rng(b))
        )
    return {k: jnp.asarray(v) for k, v in collate(samples).items()}


def _head_kwargs():
    return dict(
        num_classes=NUM_CLASSES,
        num_predicates=NUM_PREDICATES,
        mode="predcls",
        hidden_dim=32,
        roi_dim=64,
        context_pooling_dim=64,
        embed_dim=16,
        in_channels=32,
    )


@pytest.mark.parametrize("head_cls", [MotifHead, IMPHead, GPSHead])
def test_forward_loss_grad(head_cls):
    rng = np.random.default_rng(0)
    batch = _twostage_batch(rng)
    model = SceneGraphTwoStage(
        backbone=ResNet(depth=26, base_width=8),
        relation_head=head_cls(**_head_kwargs()),
        neck_channels=32,
    )
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    out = jax.jit(lambda v, b: model.apply(v, b))(variables, batch)
    B, N = batch["det_labels"].shape
    P = batch["pairs"].shape[1]
    assert out["refine_scores"].shape == (B, N, NUM_CLASSES)
    assert out["rel_scores"].shape == (B, P, NUM_PREDICATES)
    assert out["obj_preds"].shape == (B, N)

    def loss_fn(v):
        o = model.apply(v, batch)
        losses = twostage_loss(o, batch)
        return losses["loss_total"], losses

    (total, losses), grads = jax.jit(
        lambda v: jax.value_and_grad(loss_fn, has_aux=True)(v)
    )(variables)
    assert np.isfinite(float(total)), {k: float(v) for k, v in losses.items()}
    head_grads = jax.tree_util.tree_leaves(grads["params"]["relation_head"])
    assert sum(float(jnp.abs(g).sum()) for g in head_grads) > 0


def test_pair_samplers():
    relmap = np.zeros((6, 6), np.int64)
    relmap[0, 1] = 3
    relmap[2, 3] = 1
    pairs, labels, valid = sample_train_pairs(
        relmap, n_valid=4, max_pairs=16, rng=np.random.default_rng(0)
    )
    got = {(int(s), int(o), int(l)) for (s, o), l, v in zip(pairs, labels, valid) if v and l > 0}
    assert got == {(0, 1, 3), (2, 3, 1)}
    # negatives have label 0 and valid endpoints < 4
    negs = [(s, o) for (s, o), l, v in zip(pairs, labels, valid) if v and l == 0]
    assert all(s < 4 and o < 4 and s != o for s, o in negs)
    assert len(negs) > 0

    pairs, valid = all_test_pairs(3, 5)
    assert pairs.shape == (20, 2)
    assert valid.sum() == 3 * 2  # ordered pairs among 3 valid


def test_frequency_bias():
    stats = np.zeros((7, 7, 6), np.float32)
    stats[2, 3, 4] = 1.5
    fb = FrequencyBias(7, 6, statistics=stats)
    params = fb.init(jax.random.PRNGKey(0), jnp.zeros((1, 2), jnp.int32))
    out = fb.apply(params, jnp.asarray([[3, 4]]))  # labels 1-based
    assert out.shape == (1, 6)
    assert float(out[0, 4]) == pytest.approx(1.5)


def test_postprocess_ranking():
    rng = np.random.default_rng(1)
    batch = _twostage_batch(rng, train=False)
    B, P = batch["pair_valid"].shape
    out = {
        "rel_scores": rng.normal(size=(B, P, NUM_PREDICATES)).astype(np.float32),
        "refine_scores": rng.normal(size=(B, 6, NUM_CLASSES)).astype(np.float32),
        "obj_preds": rng.integers(1, NUM_CLASSES, size=(B, 6)).astype(np.int32),
    }
    res = twostage_postprocess(out, batch, 0)
    assert res["rel_pair_idxes"].shape[1] == 2
    assert res["rel_dists"].shape[1] == NUM_PREDICATES
    # bg column zeroed
    assert (res["rel_dists"][:, 0] == 0).all()


def test_detect_relsample():
    from pairnet_tpu.models.heads.twostage.core import detect_relsample

    gt_boxes = np.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], np.float32)
    gt_labels = np.asarray([3, 5])
    relmap = np.zeros((2, 2), np.int64)
    relmap[0, 1] = 4
    # det 0 matches gt0 (same label high IoU); det 1 matches gt1;
    # det 2 wrong label; det 3 is background (label 0)
    det_boxes = np.asarray(
        [[1, 1, 10, 10], [20, 20, 29, 29], [0, 0, 10, 10], [50, 50, 60, 60]],
        np.float32,
    )
    det_labels = np.asarray([3, 5, 7, 0])
    pairs, labels, valid = detect_relsample(
        det_boxes, det_labels, gt_boxes, gt_labels, relmap,
        max_pairs=16, rng=np.random.default_rng(0),
    )
    fg = {(int(s), int(o), int(l)) for (s, o), l, v in zip(pairs, labels, valid) if v and l > 0}
    assert fg == {(0, 1, 4)}
    # background pairs exclude the bg detection (index 3)
    bg = [(s, o) for (s, o), l, v in zip(pairs, labels, valid) if v and l == 0]
    assert all(3 not in (s, o) for s, o in bg) and len(bg) > 0


def test_rankers_and_weak_labels():
    import jax
    import jax.numpy as jnp
    from pairnet_tpu.models.heads.twostage.ranker import (
        LSTMRanker,
        LinearRanker,
        get_weak_key_rel_labels,
    )

    rng = np.random.default_rng(0)
    B, P, D = 2, 6, 16
    feats = jnp.asarray(rng.normal(size=(B, P, D)), jnp.float32)
    valid = jnp.asarray([[True] * 4 + [False] * 2] * B)
    lr = LinearRanker(hidden_dim=8)
    params = lr.init(jax.random.PRNGKey(0), feats, valid)
    scores = lr.apply(params, feats, valid)
    assert scores.shape == (B, P)
    assert (np.asarray(scores)[:, 4:] < -1e8).all()

    boxes = jnp.asarray(rng.uniform(0, 20, size=(B, P, 4)), jnp.float32)
    lstm = LSTMRanker(hidden_dim=8)
    params = lstm.init(jax.random.PRNGKey(0), feats, boxes, valid)
    s2 = lstm.apply(params, feats, boxes, valid)
    assert s2.shape == (B, P)

    sal = jnp.ones((16, 16)) * 0.5
    obj_boxes = jnp.asarray([[0, 0, 8, 8], [8, 8, 15, 15], [0, 0, 3, 3]], jnp.float32)
    pairs = jnp.asarray([[0, 1], [1, 2], [0, 2]])
    pv = jnp.asarray([True, True, False])
    w = get_weak_key_rel_labels(sal, obj_boxes, pairs, pv)
    assert float(w.sum()) == pytest.approx(1.0, abs=1e-5)
    assert float(w[2]) < 1e-6  # invalid pair gets ~zero mass
    assert float(w[0]) > float(w[1])  # bigger boxes -> more importance
