"""Multi-device evaluation (VERDICT r3 #5).

Counterpart of the reference's multi_gpu_test result gathering
(ref: tools/test.py:255-267): here the batch axis shards over the data mesh
and metric sufficient statistics gather exactly. On the 8-device virtual
CPU mesh (conftest) the sharded run must produce IDENTICAL metrics to the
single-device run.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.config import load_config
from pairnet_tpu.evaluation.device_eval import SgdetAccumulator
from pairnet_tpu.evaluation.runner import evaluate_model_device
from pairnet_tpu.parallel.mesh import batch_sharding, make_mesh
from pairnet_tpu.train.builder import (
    build_dataset,
    build_detector,
    build_pipeline_cfg,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_sharded_eval_matches_single_device():
    cfg = load_config(os.path.join(REPO, "configs", "pairnet", "tiny_synthetic.py"))
    model = build_detector(cfg)
    pipe_cfg = build_pipeline_cfg(cfg, train=False)
    dataset = build_dataset(cfg, split="train")  # 5 train images

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(3), jnp.zeros((1, *pipe_cfg.padded_hw(), 3))
    )
    fwd = jax.jit(lambda v, img: model.apply(v, img))

    kwargs = dict(
        mode="sgdet",
        num_predicates=cfg.num_relation_classes,
        num_things=cfg.evaluation.num_things,
        iou_thr=0.5,
    )
    single = evaluate_model_device(
        lambda img: fwd(variables, jnp.asarray(img)),
        dataset, pipe_cfg, batch_size=1, **kwargs,
    )

    assert len(jax.devices()) == 8
    sh = batch_sharding(make_mesh())
    sharded = evaluate_model_device(
        lambda img: fwd(variables, jax.device_put(jnp.asarray(img), sh)),
        dataset, pipe_cfg, batch_size=8, **kwargs,
    )
    assert set(single) == set(sharded)
    # phrdet + 4-group keys present (full oracle key set, VERDICT r3 #6)
    assert "phrdet_recall_R@50" in single
    assert "sgdet_group_tt_R@20" in single
    for k, v in single.items():
        np.testing.assert_allclose(sharded[k], v, atol=1e-6, err_msg=k)


def test_accumulator_gather_stats_merge_exactly():
    """The (sum, count) bucket stats reduce to the same metrics whether
    images are scored by one accumulator or split across several (the
    multi-process gather sums exactly these arrays)."""
    rng = np.random.default_rng(7)
    T = (20, 50, 100)

    def rand_image():
        R = int(rng.integers(1, 6))
        matched = rng.random((3, R)) < 0.5
        phr = matched | (rng.random((3, R)) < 0.3)
        rv = np.ones(R, bool)
        rels = np.stack(
            [rng.integers(0, 4, R), rng.integers(0, 4, R), rng.integers(1, 6, R)], -1
        )
        labels = rng.integers(1, 8, 4)
        return matched, phr, rv, rels, labels

    images = [rand_image() for _ in range(12)]
    whole = SgdetAccumulator(5, num_things=4, topks=T)
    parts = [SgdetAccumulator(5, num_things=4, topks=T) for _ in range(3)]
    for i, img in enumerate(images):
        whole.add(*img)
        parts[i % 3].add(*img)

    ref = whole.summarize("sgdet")
    # merge part stats the way the process gather does: sum bucket arrays
    stats = [p._bucket_stats() for p in parts]
    merged = jax.tree_util.tree_map(lambda *xs: np.sum(xs, axis=0), *stats)
    tmp = SgdetAccumulator(5, num_things=4, topks=T)
    tmp._bucket_stats = lambda: merged  # type: ignore[method-assign]
    got = tmp.summarize("sgdet")
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], atol=1e-9, err_msg=k)
