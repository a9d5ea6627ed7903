"""Panoptic FPN detector inference smoke test."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.panoptic_fpn import (
    PanopticFPN,
    delta2bbox,
    make_anchors,
)


def test_anchors_and_decode():
    a = make_anchors(2, 3, stride=16)
    assert a.shape == (2 * 3 * 3, 4)
    # zero deltas decode back to anchors
    d = jnp.zeros((a.shape[0], 4))
    np.testing.assert_allclose(np.asarray(delta2bbox(a, d)), np.asarray(a), atol=1e-4)


def test_detector_inference():
    det = PanopticFPN(
        backbone=ResNet(depth=26, base_width=8),
        num_things=5, num_stuff=3, num_proposals=32, max_dets=8,
        score_thr=0.0,
    )
    img = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64, 64, 3)), jnp.float32)
    hw = jnp.asarray([[64, 64]], jnp.int32)
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), img, hw)
    dets, sem = jax.jit(det.apply)(variables, img, hw)
    assert dets.boxes.shape == (1, 8, 4)
    assert dets.labels.shape == (1, 8)
    assert sem.shape[:3] == (1, 16, 16)  # stride-4 semantic logits
    assert np.isfinite(np.asarray(dets.scores)).all()
    # labels are 1-based with 0 for invalid slots
    lab = np.asarray(dets.labels)
    val = np.asarray(dets.valid)
    assert (lab[val] >= 1).all()
    assert (lab[~val] == 0).all()
