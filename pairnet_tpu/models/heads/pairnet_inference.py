"""Pair-Net inference post-processing, fully on device.

Behavioral counterpart of CrossHead2.get_bboxes/_get_bboxes_single
(ref: pairnet/models/relation_heads/pairnet_head.py:759-924), which runs
per-image CPU tensor loops; here everything is fixed-shape XLA:

* sub/obj labels: argmax over softmax with the background column dropped,
  +1 shift (1-based labels; ref: pairnet_head.py:813-816),
* r_dists: softmax over predicates with a prepended zero background column
  (ref: pairnet_head.py:817-820),
* DETR-style panoptic fusion: queries kept if score > 0.5 and label not the
  last foreground class (a quirk inherited from DETR's bg check applied
  after slicing — reproduced for parity; ref: pairnet_head.py:846-848),
  per-pixel softmax-argmax over kept queries, stuff-class dedup (labels >=
  num_things merged into the first kept query of that class;
  ref: pairnet_head.py:858-880), iterative removal of segments with area
  <= 4 (ref: pairnet_head.py:891-905), pan id = m_id * INSTANCE_OFFSET +
  label (mmdet INSTANCE_OFFSET = 1000; ref: pairnet_head.py:882),
* sub/obj segmentation masks: sigmoid > 0.5 at output resolution.

The fixed-point "remove tiny segments" loop is a lax.while_loop over a
boolean keep vector instead of data-dependent re-filtering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

INSTANCE_OFFSET = 1000  # mmdet.datasets.coco_panoptic.INSTANCE_OFFSET
NO_OBJ = 133  # pan_seg id fill when nothing is detected (torch.ones * offset)


class PanopticFusionResult(NamedTuple):
    pan_seg: jnp.ndarray  # (H, W) int32: m_id * INSTANCE_OFFSET + label
    keep: jnp.ndarray  # (Q,) bool final kept queries
    labels: jnp.ndarray  # (Q,) int32 per-query class (0-based)
    scores: jnp.ndarray  # (Q,) f32


def panoptic_fusion(
    cls_logits: jnp.ndarray,  # (Q, C+1)
    mask_logits: jnp.ndarray,  # (Q, H, W) at output resolution
    num_things: int = 80,
    score_thr: float = 0.5,
    min_area: int = 4,
) -> PanopticFusionResult:
    Q, C1 = cls_logits.shape
    C = C1 - 1
    probs = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)[:, :-1]
    scores = probs.max(-1)
    labels = probs.argmax(-1).astype(jnp.int32)
    # parity quirk: the reference excludes label == C-1, not the bg column
    keep0 = (labels != C - 1) & (scores > score_thr)

    H, W = mask_logits.shape[-2:]
    flat = mask_logits.reshape(Q, H * W).astype(jnp.float32)

    # stuff dedup: among kept queries of the same stuff class, redirect to the
    # first (lowest index) one
    is_stuff = labels >= num_things
    same_class = (labels[:, None] == labels[None, :]) & keep0[None, :]
    qidx = jnp.arange(Q, dtype=jnp.int32)
    first_same = jnp.where(same_class, qidx[None, :], Q).min(axis=1)
    redirect = jnp.where(is_stuff & keep0 & (first_same < Q), first_same, qidx)

    def fuse(keep):
        # per-pixel argmax over kept queries of softmax across queries;
        # masked-out queries get -inf so they never win
        logits = jnp.where(keep[:, None], flat, -jnp.inf)
        m_id = jnp.argmax(logits, axis=0).astype(jnp.int32)  # (H*W,)
        m_id = redirect[m_id]
        any_kept = keep.any()
        m_id = jnp.where(any_kept, m_id, 0)
        areas = jnp.zeros((Q,), jnp.int32).at[m_id].add(1, mode="drop")
        areas = jnp.where(keep, areas, 0)
        # redirected-away queries must not be pruned by the area rule; fold
        # their area into the target instead (they own no pixels by design)
        return m_id, areas

    def cond(state):
        keep, _ = state
        _, areas = fuse(keep)
        tiny = keep & (areas <= min_area)
        return tiny.any()

    def body(state):
        keep, _ = state
        _, areas = fuse(keep)
        tiny = keep & (areas <= min_area)
        return keep & ~tiny, areas

    # note: queries redirected away by stuff dedup have area 0 and are
    # dropped on the first iteration, exactly like the reference (their
    # pixels belong to the dedup target)
    keep, _ = jax.lax.while_loop(cond, body, (keep0, jnp.zeros((Q,), jnp.int32)))

    m_id, _ = fuse(keep)
    pan = jnp.where(
        keep.any(),
        m_id * INSTANCE_OFFSET + labels[m_id],
        # reference fallback: torch.ones -> id 1 (VOID-ish); keep semantics
        jnp.ones((H * W,), jnp.int32) * INSTANCE_OFFSET + NO_OBJ,
    )
    return PanopticFusionResult(
        pan_seg=pan.reshape(H, W), keep=keep, labels=labels, scores=scores
    )


class TripletPrediction(NamedTuple):
    """Fixed-shape per-image triplet outputs (counterpart of the tuple
    returned at pairnet_head.py:906-924 + triplet2Result, frameworks/
    psgtr.py:15-70)."""

    labels: jnp.ndarray  # (2K,) 1-based sub then obj labels
    rel_pairs: jnp.ndarray  # (K, 2) indices [i, i+K]
    masks: jnp.ndarray  # (2K, H, W) bool sub then obj masks
    pan_seg: jnp.ndarray  # (H, W) int32
    r_dists: jnp.ndarray  # (K, R+1) predicate distribution with bg col
    r_labels: jnp.ndarray  # (K,) argmax predicate (1-based)
    r_scores: jnp.ndarray  # (K,) max predicate prob


def pairnet_postprocess(
    outputs: dict,
    image_index: int | None = None,
    num_things: int = 80,
) -> TripletPrediction:
    """Post-process one image's raw head outputs (index b of each entry)."""
    b = image_index
    get = (lambda x: x[b]) if b is not None else (lambda x: x)
    s_cls = get(outputs["sub"])  # (K, C+1)
    o_cls = get(outputs["obj"])
    r_cls = get(outputs["rel"])  # (K, R)
    cls = get(outputs["cls"])  # (Q, C+1)
    mask = get(outputs["mask"])  # (Q, H, W)
    s_seg = get(outputs["sub_seg"])  # (K, H, W)
    o_seg = get(outputs["obj_seg"])

    K, R = r_cls.shape
    s_logits = jax.nn.softmax(s_cls.astype(jnp.float32), axis=-1)[:, :-1]
    o_logits = jax.nn.softmax(o_cls.astype(jnp.float32), axis=-1)[:, :-1]
    s_labels = s_logits.argmax(-1).astype(jnp.int32) + 1
    o_labels = o_logits.argmax(-1).astype(jnp.int32) + 1

    r_dists = jax.nn.softmax(r_cls.astype(jnp.float32), axis=-1)
    r_dists = jnp.concatenate([jnp.zeros((K, 1), jnp.float32), r_dists], axis=-1)

    fusion = panoptic_fusion(cls, mask, num_things=num_things)

    masks = jnp.concatenate(
        [jax.nn.sigmoid(s_seg) > 0.5, jax.nn.sigmoid(o_seg) > 0.5], axis=0
    )
    rel_pairs = jnp.stack(
        [jnp.arange(K, dtype=jnp.int32), jnp.arange(K, 2 * K, dtype=jnp.int32)],
        axis=-1,
    )
    return TripletPrediction(
        labels=jnp.concatenate([s_labels, o_labels]),
        rel_pairs=rel_pairs,
        masks=masks,
        pan_seg=fusion.pan_seg,
        r_dists=r_dists,
        r_labels=r_dists[:, 1:].argmax(-1).astype(jnp.int32) + 1,
        r_scores=r_dists[:, 1:].max(-1),
    )
