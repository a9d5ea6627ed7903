"""Diagnostic panoptic head: score an EXTERNAL segmenter through the SGG
evaluation harness.

Behavioral counterpart of ``FacebookHead``
(ref: pairnet/models/relation_heads/facebook_detr.py:20-283): the reference
torch.hub-loads Facebook's pretrained DETR-R101-panoptic, runs the official
DETR panoptic fusion (softmax-argmax over queries, stuff dedup, iterative
tiny-segment refiltering), remaps its 250-class label space onto PSG's 133
classes via a lookup table (``facebook2ours``), and emits DUMMY relation
outputs so the whole thing flows through the PSG evaluator — a debugging
aid to measure how much segmentation quality caps recall.

The TPU-native version is source-agnostic: ``diagnostic_postprocess`` takes
per-query class logits + mask logits from ANY external segmenter (e.g. a
jax-ported DETR, an HF transformers checkpoint run offline, or this repo's
own Mask2Former) plus an optional label-mapping table, reuses
:func:`pairnet_tpu.models.heads.pairnet_inference.panoptic_fusion` (the
same fusion incl. the reference's label != C-1 keep quirk), and returns a
TripletPrediction with zeroed predicate distributions — evaluable for PQ /
detection quality, guaranteed-zero recall.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pairnet_tpu.models.heads.pairnet_inference import (
    TripletPrediction,
    panoptic_fusion,
)


def diagnostic_postprocess(
    outputs: dict,
    image_index: int | None = None,
    num_things: int = 80,
    num_relations: int = 56,
    label_mapping: jnp.ndarray | None = None,
    score_thr: float = 0.85,
):
    """outputs: {'cls': (B, Q, C+1), 'mask': (B, Q, h, w)} from an external
    segmenter. ``label_mapping`` is the facebook2ours analog: an int table
    indexed by the segmenter's 0-based label, yielding the target dataset's
    0-based label (identity when None). Returns a TripletPrediction whose
    relation fields are all dummy (ref: facebook_detr.py:258-266)."""
    b = image_index
    get = (lambda x: x[b]) if b is not None else (lambda x: x)
    cls_logits = get(outputs["cls"])  # (Q, C+1)
    mask_logits = get(outputs["mask"])  # (Q, h, w)
    Q = cls_logits.shape[0]
    h, w = mask_logits.shape[-2:]

    fused = panoptic_fusion(
        cls_logits, mask_logits, num_things=num_things, score_thr=score_thr
    )
    labels0 = fused.labels
    pan_seg = fused.pan_seg
    if label_mapping is not None:
        labels0 = jnp.asarray(label_mapping)[labels0]
        # deviation from the reference: its pan_img keeps the EXTERNAL label
        # space (fusion runs before the facebook2ours remap,
        # ref: facebook_detr.py:231/254); here the panoptic image is rebuilt
        # in the mapped space so PQ against the target dataset is meaningful
        from pairnet_tpu.models.heads.pairnet_inference import INSTANCE_OFFSET

        m_id = pan_seg // INSTANCE_OFFSET
        pan_seg = m_id * INSTANCE_OFFSET + labels0[m_id]
    # duplicated sub/obj views of the same detections, 1-based labels
    # (ref: facebook_detr.py:254-258 `torch.cat([all_labels] * 2) + 1`);
    # dropped queries get label 0 / empty mask so they can never match
    labels1 = jnp.where(fused.keep, labels0 + 1, 0)
    masks = (jax.nn.sigmoid(mask_logits.astype(jnp.float32)) > 0.5) & (
        fused.keep[:, None, None]
    )
    return TripletPrediction(
        labels=jnp.concatenate([labels1, labels1]).astype(jnp.int32),
        rel_pairs=jnp.stack(
            [jnp.arange(Q, dtype=jnp.int32), jnp.arange(Q, 2 * Q, dtype=jnp.int32)],
            axis=-1,
        ),
        masks=jnp.concatenate([masks, masks], axis=0),
        pan_seg=pan_seg,
        r_dists=jnp.zeros((Q, num_relations + 1), jnp.float32),
        r_labels=jnp.zeros((Q,), jnp.int32),
        r_scores=jnp.zeros((Q,), jnp.float32),
    )
