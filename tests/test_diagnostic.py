"""Diagnostic panoptic head (FacebookHead counterpart): external segmenter
outputs -> panoptic fusion + dummy relations, PQ-evaluable."""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.models.heads.diagnostic import diagnostic_postprocess
from pairnet_tpu.models.heads.pairnet_inference import INSTANCE_OFFSET


def test_diagnostic_fusion_and_mapping():
    Q, C, h, w = 6, 10, 16, 16
    cls = np.full((1, Q, C + 1), -5.0, np.float32)
    cls[0, :, C] = 5.0  # default: background wins
    # query 0 -> external class 2, query 1 -> external class 5
    cls[0, 0, 2], cls[0, 0, C] = 8.0, -8.0
    cls[0, 1, 5], cls[0, 1, C] = 8.0, -8.0
    mask = np.full((1, Q, h, w), -10.0, np.float32)
    mask[0, 0, :, :8] = 10.0
    mask[0, 1, :, 8:] = 10.0
    mapping = jnp.asarray(np.arange(C) * 3)  # external -> ours: i -> 3i

    pred = jax.jit(
        lambda o: diagnostic_postprocess(
            o, image_index=0, num_things=4, num_relations=7,
            label_mapping=mapping,
        )
    )({"cls": jnp.asarray(cls), "mask": jnp.asarray(mask)})

    labels = np.asarray(pred.labels)
    assert labels.shape == (2 * Q,)
    assert labels[0] == 2 * 3 + 1 and labels[1] == 5 * 3 + 1  # mapped, 1-based
    assert (labels[2:Q] == 0).all()  # dropped queries neutralized
    np.testing.assert_array_equal(labels[:Q], labels[Q:])  # duplicated views
    # relation fields are dummies
    assert float(np.abs(np.asarray(pred.r_dists)).sum()) == 0.0
    # panoptic image carries the fused labels
    pan = np.asarray(pred.pan_seg)
    assert pan.shape == (h, w)
    assert set(np.unique(pan % INSTANCE_OFFSET)) == {6, 15}
    m = np.asarray(pred.masks)
    assert m[0, :, :8].all() and not m[0, :, 8:].any()
    assert not m[3].any()  # dropped query has an empty mask
