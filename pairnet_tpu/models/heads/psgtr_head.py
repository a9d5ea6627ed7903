"""PSGTr head: single-decoder triplet DETR for one-stage scene graphs.

Behavioral counterpart of pairnet/models/relation_heads/psgtr_head.py
(config configs/psgtr/psgtr_r50.py): a plain DETR transformer (6 enc + 6 dec,
post-norm) over the stride-32 feature map; every query predicts a full
triplet — subject class/box/mask, object class/box/mask, predicate:

* boxes: 3-layer MLP -> sigmoid, normalized cxcywh (ref: psgtr_head.py:245),
* masks: MHAttentionMap per-query attention over the memory (softmaxed
  dot-product maps, no value multiply; ref: psgtr_head.py:1352-1400) fed
  with the projected features into MaskHeadSmallConv, an FPN-style conv
  stack upsampling stride 32 -> 4 (ref: psgtr_head.py:1274-1350),
* HTriMatcher Hungarian on s/o (cls 1.0 + L1 5.0 + gIoU 2.0) + rel cls 2.0
  (ref: approaches/matcher.py:106; train_cfg at psgtr_head.py:76-86),
* per-decoder-layer losses: s/o CE (bg weight 0.02, matched-only weights,
  avg #pos), rel CE (all queries, bg label 0, avg #pos + 0.02 #neg),
  L1 5.0 + gIoU 2.0, dice 1.0 on matched masks (focal built but unused in
  the reference — ref: psgtr_head.py:623-627).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pairnet_tpu.config.registry import HEADS
from pairnet_tpu.models.layers import FFN, MLP, MultiheadAttention, sine_positional_encoding
 
from pairnet_tpu.models.matchers import classification_cost
from pairnet_tpu.ops.boxes import cxcywh_to_xyxy, generalized_box_iou
from pairnet_tpu.ops.hungarian import hungarian


class EncoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, x, pos):
        x = x + MultiheadAttention(self.embed_dims, self.num_heads, name="self_attn")(
            x + pos, x + pos, x
        )
        x = nn.LayerNorm(name="norm1")(x)
        x = x + FFN(self.embed_dims, self.feedforward_channels, name="ffn")(x)
        return nn.LayerNorm(name="norm2")(x)


class DETRDecoderLayer(nn.Module):
    """DETR order: self_attn -> norm -> cross_attn -> norm -> ffn -> norm."""

    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, q, qpos, memory, mpos):
        x = q + MultiheadAttention(self.embed_dims, self.num_heads, name="self_attn")(
            q + qpos, q + qpos, q
        )
        x = nn.LayerNorm(name="norm1")(x)
        x = x + MultiheadAttention(self.embed_dims, self.num_heads, name="cross_attn")(
            x + qpos, memory + mpos, memory
        )
        x = nn.LayerNorm(name="norm2")(x)
        x = x + FFN(self.embed_dims, self.feedforward_channels, name="ffn")(x)
        return nn.LayerNorm(name="norm3")(x)


class DETRTransformer(nn.Module):
    """Encoder + decoder, returning all intermediate decoder states + memory."""

    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    feedforward_channels: int = 2048

    @nn.compact
    def __call__(self, feat_tokens, pos, query_embed):
        """feat_tokens (B, S, C); pos (1|B, S, C); query_embed (Q, C)."""
        B = feat_tokens.shape[0]
        mem = feat_tokens
        for i in range(self.num_encoder_layers):
            mem = EncoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                name=f"enc_{i}",
            )(mem, pos)
        Q = query_embed.shape[0]
        qpos = query_embed[None]
        x = jnp.zeros((B, Q, self.embed_dims), feat_tokens.dtype)
        outs = []
        for i in range(self.num_decoder_layers):
            x = DETRDecoderLayer(
                self.embed_dims, self.num_heads, self.feedforward_channels,
                name=f"dec_{i}",
            )(x, qpos, mem, pos)
            outs.append(x)
        post = nn.LayerNorm(name="post_norm")  # shared across layers (DETR)
        outs = [post(o) for o in outs]
        return outs, mem


class MHAttentionMap(nn.Module):
    """Per-query multi-head 2D attention maps (softmax only, no values)."""

    query_dim: int
    hidden_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k_map):
        """q (B, Q, C); k_map (B, H, W, C) -> (B, Q, heads, H, W)."""
        qh = nn.Dense(self.hidden_dim, name="q_linear")(q)
        kh = nn.Dense(self.hidden_dim, name="k_linear")(k_map)
        B, Q, _ = qh.shape
        Hh = self.num_heads
        D = self.hidden_dim // Hh
        qh = qh.reshape(B, Q, Hh, D) * (float(D) ** -0.5)
        Hm, Wm = k_map.shape[1], k_map.shape[2]
        kh = kh.reshape(B, Hm, Wm, Hh, D)
        w = jnp.einsum("bqnc,bhwnc->bqnhw", qh, kh, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w.reshape(B, Q, Hh, -1).astype(jnp.float32), -1)
        return w.reshape(B, Q, Hh, Hm, Wm)


class MaskHeadSmallConv(nn.Module):
    """DETR panoptic mask head: conv stack with FPN adapters, stride 32 -> 4."""

    dim: int  # input channels = context_dim + num_heads
    context_dim: int = 256

    @nn.compact
    def __call__(self, x, fpn_feats):
        """x (N, h32, w32, dim); fpn_feats [C4, C3, C2] NHWC. -> (N, h4, w4)."""
        inter = [
            self.dim,
            self.context_dim // 2,
            self.context_dim // 4,
            self.context_dim // 8,
            self.context_dim // 16,
        ]

        def conv_gn(z, ch, name):
            z = nn.Conv(ch, (3, 3), padding=[(1, 1), (1, 1)], name=f"lay{name}")(z)
            # GN(8) like the reference; fall back to gcd for tiny test dims
            groups = math.gcd(8, ch)
            return nn.relu(nn.GroupNorm(num_groups=groups, name=f"gn{name}")(z))

        def up_to(z, hw):
            # nearest upsample to target (torch F.interpolate mode='nearest')
            n, h, w, c = z.shape
            ys = (jnp.arange(hw[0]) * h // hw[0]).astype(jnp.int32)
            xs = (jnp.arange(hw[1]) * w // hw[1]).astype(jnp.int32)
            return z[:, ys][:, :, xs]

        x = conv_gn(x, self.dim, "1")
        x = conv_gn(x, inter[1], "2")
        for i, (feat, ch) in enumerate(zip(fpn_feats, inter[2:5])):
            lat = nn.Conv(inter[i + 1], (1, 1), name=f"adapter{i + 1}")(feat)
            x = lat + up_to(x, (lat.shape[1], lat.shape[2]))
            x = conv_gn(x, ch, str(i + 3))
        return nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)], name="out_lay")(x)[..., 0]


@HEADS.register()
class PSGTrHead(nn.Module):
    num_classes: int = 133
    num_relations: int = 56
    num_query: int = 100
    embed_dims: int = 256
    num_heads: int = 8
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    use_mask: bool = True
    in_channels: int = 2048

    def setup(self):
        C = self.embed_dims
        self.input_proj = nn.Conv(C, (1, 1), name="input_proj")
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_query, C)
        )
        self.transformer = DETRTransformer(
            C, self.num_heads, self.num_encoder_layers, self.num_decoder_layers,
            name="transformer",
        )
        self.sub_cls_embed = nn.Dense(self.num_classes + 1, name="sub_cls_embed")
        self.obj_cls_embed = nn.Dense(self.num_classes + 1, name="obj_cls_embed")
        self.rel_cls_embed = nn.Dense(self.num_relations + 1, name="rel_cls_embed")
        self.sub_box_embed = MLP(C, 4, 3, name="sub_box_embed")
        self.obj_box_embed = MLP(C, 4, 3, name="obj_box_embed")
        if self.use_mask:
            self.sub_bbox_attention = MHAttentionMap(C, C, self.num_heads, name="sub_bbox_attention")
            self.obj_bbox_attention = MHAttentionMap(C, C, self.num_heads, name="obj_bbox_attention")
            self.sub_mask_head = MaskHeadSmallConv(C + self.num_heads, C, name="sub_mask_head")
            self.obj_mask_head = MaskHeadSmallConv(C + self.num_heads, C, name="obj_mask_head")

    def __call__(self, feats: Sequence[jnp.ndarray], deterministic: bool = True):
        """feats: (C2, C3, C4, C5) NHWC."""
        c5 = feats[-1]
        B, H32, W32, _ = c5.shape
        proj = self.input_proj(c5)
        pos = sine_positional_encoding(H32, W32, self.embed_dims // 2)
        tokens = proj.reshape(B, -1, self.embed_dims)
        pos_t = pos.reshape(1, -1, self.embed_dims)

        outs, memory = self.transformer(tokens, pos_t, self.query_embed)
        last = outs[-1]
        Q = self.num_query

        sub_cls = [self.sub_cls_embed(o) for o in outs]
        obj_cls = [self.obj_cls_embed(o) for o in outs]
        rel_cls = [self.rel_cls_embed(o) for o in outs]
        sub_box = [jax.nn.sigmoid(self.sub_box_embed(o)) for o in outs]
        obj_box = [jax.nn.sigmoid(self.obj_box_embed(o)) for o in outs]

        out = {
            "sub": sub_cls[-1],
            "obj": obj_cls[-1],
            "rel": rel_cls[-1],
            "sub_box": sub_box[-1],
            "obj_box": obj_box[-1],
            "layers": {
                "sub": sub_cls, "obj": obj_cls, "rel": rel_cls,
                "sub_box": sub_box, "obj_box": obj_box,
            },
        }
        if self.use_mask:
            mem_map = memory.reshape(B, H32, W32, self.embed_dims)
            s_attn = self.sub_bbox_attention(last, mem_map)  # (B,Q,h,h32,w32)
            o_attn = self.obj_bbox_attention(last, mem_map)
            fpn = [feats[2], feats[1], feats[0]]

            def run_mask_head(head, attn):
                x = jnp.concatenate(
                    [
                        jnp.broadcast_to(
                            proj[:, None], (B, Q, H32, W32, self.embed_dims)
                        ).reshape(B * Q, H32, W32, self.embed_dims),
                        attn.transpose(0, 1, 3, 4, 2).reshape(
                            B * Q, H32, W32, self.num_heads
                        ),
                    ],
                    axis=-1,
                )
                fpn_rep = [
                    jnp.repeat(f, Q, axis=0) for f in fpn
                ]  # (B*Q, h, w, c)
                m = head(x, fpn_rep)
                return m.reshape(B, Q, m.shape[-2], m.shape[-1])

            out["sub_seg"] = run_mask_head(self.sub_mask_head, s_attn)
            out["obj_seg"] = run_mask_head(self.obj_mask_head, o_attn)
        return out


def _l1_cost(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """mmdet BBoxL1Cost on normalized cxcywh. (Q, R)."""
    return jnp.abs(pred[:, None, :] - gt[None, :, :]).sum(-1)


def htri_match(
    s_cls, o_cls, r_cls, s_box, o_box,
    gt_s_box, gt_o_box, gt_s_lbl, gt_o_lbl, gt_r_lbl, rel_valid,
    img_hw,
):
    """HTriMatcher: Hungarian over summed triplet costs (one image).

    boxes normalized cxcywh; gIoU computed on image-scaled xyxy like mmdet
    IoUCost (ref: matcher.py:106-205). Returns relq2gt (Q,) index or -1.
    """
    h, w = img_hw
    factor = jnp.asarray([w, h, w, h], jnp.float32)
    cost = (
        classification_cost(s_cls, gt_s_lbl)
        + classification_cost(o_cls, gt_o_lbl)
        + 2.0 * classification_cost(r_cls, gt_r_lbl)
        + 5.0 * (_l1_cost(s_box, gt_s_box) + _l1_cost(o_box, gt_o_box))
        + 2.0 * -generalized_box_iou(
            cxcywh_to_xyxy(s_box) * factor, cxcywh_to_xyxy(gt_s_box) * factor
        )
        + 2.0 * -generalized_box_iou(
            cxcywh_to_xyxy(o_box) * factor, cxcywh_to_xyxy(gt_o_box) * factor
        )
    )
    row2col, _ = hungarian(cost, col_mask=rel_valid)
    return row2col


def psgtr_loss(
    outputs,
    batch,
    num_classes: int = 133,
    num_relations: int = 56,
    bg_cls_weight: float = 0.02,
    box_l1_weight: float = 5.0,
    giou_weight: float = 2.0,
    rel_weight: float = 2.0,
    dice_weight: float = 1.0,
    aux_layers: bool = True,
):
    """Per-decoder-layer PSGTr losses on a padded batch.

    batch additionally needs gt_boxes (B, G, 4) xyxy in resized-image pixels.
    """
    B = outputs["sub"].shape[0]
    G = batch["gt_labels"].shape[1]
    img_hw = batch["image_shape"]  # (B, 2)

    def per_rel_gt(gt_arr, rels):
        sub = jnp.clip(rels[:, 0], 0, G - 1)
        obj = jnp.clip(rels[:, 1], 0, G - 1)
        return gt_arr[sub], gt_arr[obj]

    def layer_loss(s_cls, o_cls, r_cls, s_box, o_box, s_seg, o_seg):
        def single(s_c, o_c, r_c, s_b, o_b, labels, boxes, masks, rels, rv, hw):
            gt_s_box, gt_o_box = per_rel_gt(boxes, rels)
            gt_s_lbl, gt_o_lbl = per_rel_gt(labels, rels)
            gt_r = rels[:, 2]
            scale = jnp.concatenate([hw[::-1], hw[::-1]]).astype(jnp.float32)
            gt_s_n = jnp.asarray(
                jnp.clip(
                    jnp.stack(
                        [
                            (gt_s_box[:, 0] + gt_s_box[:, 2]) / 2 / scale[0],
                            (gt_s_box[:, 1] + gt_s_box[:, 3]) / 2 / scale[1],
                            (gt_s_box[:, 2] - gt_s_box[:, 0]) / scale[0],
                            (gt_s_box[:, 3] - gt_s_box[:, 1]) / scale[1],
                        ],
                        -1,
                    ),
                    0, 1,
                )
            )
            gt_o_n = jnp.clip(
                jnp.stack(
                    [
                        (gt_o_box[:, 0] + gt_o_box[:, 2]) / 2 / scale[0],
                        (gt_o_box[:, 1] + gt_o_box[:, 3]) / 2 / scale[1],
                        (gt_o_box[:, 2] - gt_o_box[:, 0]) / scale[0],
                        (gt_o_box[:, 3] - gt_o_box[:, 1]) / scale[1],
                    ],
                    -1,
                ),
                0, 1,
            )
            relq2gt = htri_match(
                jax.lax.stop_gradient(s_c), jax.lax.stop_gradient(o_c),
                jax.lax.stop_gradient(r_c), jax.lax.stop_gradient(s_b),
                jax.lax.stop_gradient(o_b),
                gt_s_n, gt_o_n, gt_s_lbl, gt_o_lbl, gt_r, rv, hw,
            )
            return relq2gt, gt_s_n, gt_o_n, gt_s_lbl, gt_o_lbl, gt_r

        res = jax.vmap(single)(
            s_cls, o_cls, r_cls, s_box, o_box,
            batch["gt_labels"], batch["gt_boxes"], batch["gt_masks"],
            batch["gt_rels"], batch["rel_valid"], img_hw,
        )
        relq2gt, gt_s_n, gt_o_n, gt_s_lbl, gt_o_lbl, gt_r = res
        Rm = gt_r.shape[1]
        pos = relq2gt >= 0  # (B, Q)
        safe = jnp.clip(relq2gt, 0, Rm - 1)
        take = jax.vmap(lambda a, i: a[i])
        w = pos.astype(jnp.float32)
        npos = jnp.maximum(w.sum(), 1.0)
        nneg = pos.size - w.sum()

        def ce(logits, labels, weights, avg, cw_bg=None):
            Cn = logits.shape[-1]
            lbl = jnp.clip(labels, 0, Cn - 1)
            cw = jnp.ones(Cn).at[Cn - 1 if cw_bg == "last" else 0].set(
                bg_cls_weight
            ) if cw_bg else jnp.ones(Cn)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(logp, lbl[..., None], -1)[..., 0]
            return jnp.sum(nll * cw[lbl] * weights) / avg

        s_lbl_t = jnp.where(pos, take(gt_s_lbl, safe), num_classes)
        o_lbl_t = jnp.where(pos, take(gt_o_lbl, safe), num_classes)
        r_lbl_t = jnp.where(pos, take(gt_r, safe), 0)

        losses = {
            "s_loss_cls": ce(s_cls, s_lbl_t, w, npos, "last"),
            "o_loss_cls": ce(o_cls, o_lbl_t, w, npos, "last"),
            "r_loss_cls": rel_weight * ce(
                r_cls, r_lbl_t, jnp.ones_like(w),
                jnp.maximum(npos + bg_cls_weight * nneg, 1.0), "first",
            ),
        }
        s_box_t = take(gt_s_n, safe)
        o_box_t = take(gt_o_n, safe)
        l1 = (jnp.abs(s_box - s_box_t).sum(-1) + jnp.abs(o_box - o_box_t).sum(-1))
        losses["loss_bbox"] = box_l1_weight * jnp.sum(l1 * w) / npos

        scale = jnp.concatenate(
            [img_hw[:, ::-1], img_hw[:, ::-1]], -1
        ).astype(jnp.float32)[:, None, :]
        diag = jax.vmap(lambda a, b: jnp.diagonal(generalized_box_iou(a, b)))
        g_s = diag(cxcywh_to_xyxy(s_box) * scale, cxcywh_to_xyxy(s_box_t) * scale)
        g_o = diag(cxcywh_to_xyxy(o_box) * scale, cxcywh_to_xyxy(o_box_t) * scale)
        losses["loss_iou"] = giou_weight * jnp.sum((2.0 - g_s - g_o) * w) / npos

        if s_seg is not None:
            take_m = jax.vmap(lambda m, i: m[i])
            sub_gt_idx = jnp.take_along_axis(
                jnp.clip(batch["gt_rels"][:, :, 0], 0, G - 1), safe, axis=1
            )
            obj_gt_idx = jnp.take_along_axis(
                jnp.clip(batch["gt_rels"][:, :, 1], 0, G - 1), safe, axis=1
            )
            s_gt_m = take_m(batch["gt_masks"], sub_gt_idx)  # (B, Q, h, w)
            o_gt_m = take_m(batch["gt_masks"], obj_gt_idx)

            def dice(pred, gt):
                p = jax.nn.sigmoid(pred.astype(jnp.float32)).reshape(*pred.shape[:2], -1)
                t = gt.reshape(*gt.shape[:2], -1)
                num = 2.0 * (p * t).sum(-1)
                den = (p * p).sum(-1) + (t * t).sum(-1)
                return 1.0 - (num + 1.0) / (den + 1.0)

            losses["s_loss_dice"] = dice_weight * jnp.sum(dice(s_seg, s_gt_m) * w) / npos
            losses["o_loss_dice"] = dice_weight * jnp.sum(dice(o_seg, o_gt_m) * w) / npos
        return losses

    L = outputs["layers"]
    n_layers = len(L["sub"])
    all_losses = {}
    rng_layers = range(n_layers) if aux_layers else [n_layers - 1]
    for li in rng_layers:
        seg_s = outputs.get("sub_seg") if li == n_layers - 1 else None
        seg_o = outputs.get("obj_seg") if li == n_layers - 1 else None
        ll = layer_loss(
            L["sub"][li], L["obj"][li], L["rel"][li],
            L["sub_box"][li], L["obj_box"][li], seg_s, seg_o,
        )
        tag = "" if li == n_layers - 1 else f"d{li}."
        all_losses.update({f"{tag}{k}": v for k, v in ll.items()})
    all_losses["loss_total"] = sum(all_losses.values())
    return all_losses


def psgtr_postprocess(outputs, image_index=None, num_things: int = 80):
    """PSGTr inference (ref: psgtr_head.py:1069-1239): top-k over
    (query x predicate) probs; sub/obj masks thresholded at sigmoid 0.85.
    Returns the TripletPrediction protocol (pan_seg fused from the selected
    triplet masks with the 0.85 keep rule)."""
    from pairnet_tpu.models.heads.pairnet_inference import TripletPrediction

    b = image_index
    get = (lambda x: x[b]) if b is not None else (lambda x: x)
    r_cls = get(outputs["rel"])  # (Q, R+1)
    Q, R1 = r_cls.shape
    R = R1 - 1
    r_lgs = jax.nn.softmax(r_cls.astype(jnp.float32), -1)
    flat = r_lgs[:, 1:].reshape(-1)
    _, idx = jax.lax.top_k(flat, Q)
    r_labels = idx % R + 1
    tri = idx // R

    def sm(x):
        return jax.nn.softmax(x.astype(jnp.float32), -1)[:, :-1]

    s_prob = sm(get(outputs["sub"]))[tri]
    o_prob = sm(get(outputs["obj"]))[tri]
    s_labels = s_prob.argmax(-1).astype(jnp.int32) + 1
    o_labels = o_prob.argmax(-1).astype(jnp.int32) + 1
    s_seg = get(outputs["sub_seg"])[tri]
    o_seg = get(outputs["obj_seg"])[tri]
    masks = jnp.concatenate(
        [jax.nn.sigmoid(s_seg) > 0.85, jax.nn.sigmoid(o_seg) > 0.85], axis=0
    )

    # panoptic image from the selected triplet masks (keep rule 0.85)
    all_logits = jnp.concatenate([s_seg, o_seg], axis=0).astype(jnp.float32)
    labels0 = jnp.concatenate([s_labels, o_labels]) - 1
    scores = jnp.concatenate([s_prob.max(-1), o_prob.max(-1)])
    keep = (labels0 != (s_prob.shape[-1] - 1)) & (scores > 0.85)
    flat_logits = jnp.where(
        keep[:, None], all_logits.reshape(2 * Q, -1), -jnp.inf
    )
    m_id = jnp.argmax(flat_logits, axis=0).astype(jnp.int32)
    from pairnet_tpu.models.heads.pairnet_inference import INSTANCE_OFFSET, NO_OBJ

    pan = jnp.where(
        keep.any(),
        m_id * INSTANCE_OFFSET + labels0[m_id],
        jnp.ones_like(m_id) * INSTANCE_OFFSET + NO_OBJ,
    ).reshape(all_logits.shape[-2:])

    return TripletPrediction(
        labels=jnp.concatenate([s_labels, o_labels]),
        rel_pairs=jnp.stack(
            [jnp.arange(Q, dtype=jnp.int32), jnp.arange(Q, 2 * Q, dtype=jnp.int32)],
            axis=-1,
        ),
        masks=masks,
        pan_seg=pan,
        r_dists=r_lgs[tri],
        r_labels=r_labels.astype(jnp.int32),
        r_scores=flat[idx],
    )
