"""Full-checkpoint conversion roundtrip: reference-named state_dict ->
convert_pairnet_checkpoint -> overlay onto the real flax tree.

Catches name-mapping typos and shape mismatches across the WHOLE Pair-Net
mapping (backbone + pixel decoder + transformer decoder + PPN + relation
decoder) without needing the published weights.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pairnet_tpu.models.backbones.resnet import ResNet  # noqa: E402
from pairnet_tpu.models.frameworks.psgtr import PSGTr  # noqa: E402
from pairnet_tpu.models.heads.pairnet_head import PairNetHead  # noqa: E402
from pairnet_tpu.utils.torch_convert import (  # noqa: E402
    convert_pairnet_checkpoint,
    merge_pretrained,
)


def _lin(sd, name, din, dout):
    sd[f"{name}.weight"] = torch.randn(dout, din)
    sd[f"{name}.bias"] = torch.randn(dout)


def _conv(sd, name, cin, cout, k, bias=True):
    sd[f"{name}.weight"] = torch.randn(cout, cin, k, k)
    if bias:
        sd[f"{name}.bias"] = torch.randn(cout)


def _bn(sd, name, c):
    for suffix, gen in (
        ("weight", torch.randn), ("bias", torch.randn),
        ("running_mean", torch.randn), ("running_var", torch.rand),
    ):
        sd[f"{name}.{suffix}"] = gen(c)


def _norm(sd, name, c):
    sd[f"{name}.weight"] = torch.randn(c)
    sd[f"{name}.bias"] = torch.randn(c)


def _mha(sd, name, c):
    sd[f"{name}.in_proj_weight"] = torch.randn(3 * c, c)
    sd[f"{name}.in_proj_bias"] = torch.randn(3 * c)
    _lin(sd, f"{name}.out_proj", c, c)


def _ffn(sd, name, c, ff):
    _lin(sd, f"{name}.layers.0.0", c, ff)
    _lin(sd, f"{name}.layers.1", ff, c)


def _make_reference_state_dict(C=32, n_cls=7, n_rel=5, Q=20, K=16,
                               dec_layers=3, rel_layers=2, enc_layers=1,
                               width=8):
    """Mirror the reference CrossHead2 + ResNet torch module names
    (ref: pairnet/models/relation_heads/pairnet_head.py:60-176 + mmcv/mmdet
    module layouts) at the tiny test dimensions."""
    sd = {}
    # --- backbone (torchvision ResNet-50 layout, base width 8) ---
    _conv(sd, "backbone.conv1", 3, width, 7, bias=False)
    _bn(sd, "backbone.bn1", width)
    planes = width
    cin = width
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for b in range(blocks):
            pre = f"backbone.layer{stage + 1}.{b}"
            _conv(sd, f"{pre}.conv1", cin if b == 0 else planes * 4, planes, 1, bias=False)
            _bn(sd, f"{pre}.bn1", planes)
            _conv(sd, f"{pre}.conv2", planes, planes, 3, bias=False)
            _bn(sd, f"{pre}.bn2", planes)
            _conv(sd, f"{pre}.conv3", planes, planes * 4, 1, bias=False)
            _bn(sd, f"{pre}.bn3", planes * 4)
            if b == 0:
                _conv(sd, f"{pre}.downsample.0", cin, planes * 4, 1, bias=False)
                _bn(sd, f"{pre}.downsample.1", planes * 4)
        cin = planes * 4
        planes *= 2

    h = "bbox_head."
    # --- pixel decoder ---
    in_ch = [width * 4, width * 8, width * 16, width * 32]  # C2..C5
    for lvl, c_in in enumerate(reversed(in_ch[1:])):  # C5, C4, C3
        _conv(sd, f"{h}pixel_decoder.input_convs.{lvl}.conv", c_in, C, 1)
        _norm(sd, f"{h}pixel_decoder.input_convs.{lvl}.gn", C)
    for i in range(enc_layers):
        pre = f"{h}pixel_decoder.encoder.layers.{i}"
        for n, dout in (("sampling_offsets", 4 * 3 * 4 * 2),
                        ("attention_weights", 4 * 3 * 4),
                        ("value_proj", C), ("output_proj", C)):
            _lin(sd, f"{pre}.attentions.0.{n}", C, dout)
        _norm(sd, f"{pre}.norms.0", C)
        _norm(sd, f"{pre}.norms.1", C)
        _ffn(sd, f"{pre}.ffns.0", C, 1024)
    sd[f"{h}pixel_decoder.level_encoding.weight"] = torch.randn(3, C)
    _conv(sd, f"{h}pixel_decoder.lateral_convs.0.conv", in_ch[0], C, 1)
    _norm(sd, f"{h}pixel_decoder.lateral_convs.0.gn", C)
    _conv(sd, f"{h}pixel_decoder.output_convs.0.conv", C, C, 3)
    _norm(sd, f"{h}pixel_decoder.output_convs.0.gn", C)
    _conv(sd, f"{h}pixel_decoder.mask_feature", C, C, 3)
    # --- transformer decoder ---
    for i in range(dec_layers):
        pre = f"{h}transformer_decoder.layers.{i}"
        _mha(sd, f"{pre}.attentions.0.attn", C)
        _mha(sd, f"{pre}.attentions.1.attn", C)
        for n in range(3):
            _norm(sd, f"{pre}.norms.{n}", C)
        _ffn(sd, f"{pre}.ffns.0", C, 2048)
    _norm(sd, f"{h}transformer_decoder.post_norm", C)
    for n, rows in (("query_feat", Q), ("query_embed", Q), ("level_embed", 3)):
        sd[f"{h}{n}.weight"] = torch.randn(rows, C)
    _lin(sd, f"{h}cls_embed", C, n_cls + 1)
    for j in (0, 2, 4):
        _lin(sd, f"{h}mask_embed.{j}", C, C)
    # --- PPN + relation decoder ---
    for name in ("sub_query_update", "obj_query_update"):
        for j in (0, 2, 4):
            _lin(sd, f"{h}{name}.{j}", C, C)
    _lin(sd, f"{h}rel_cls_embed", C, n_rel)
    for n, rows in (("rel_query_feat", K), ("rel_query_embed", K),
                    ("rel_query_embed2", 2 * K), ("rel_query_embed3", 2 * K)):
        sd[f"{h}{n}.weight"] = torch.randn(rows, C)
    _conv(sd, f"{h}update_importance.conv_layers.0.0", 1, 64, 7)
    _conv(sd, f"{h}update_importance.conv_layers.1.0", 64, 64, 7)
    _conv(sd, f"{h}update_importance.conv_layers.2.0", 64, 1, 7)
    for i in range(rel_layers):
        pre = f"{h}relation_decoder.layers.{i}"
        _mha(sd, f"{pre}.attentions.0.attn", C)
        _mha(sd, f"{pre}.attentions.1.attn", C)
        for n in range(3):
            _norm(sd, f"{pre}.norms.{n}", C)
        _ffn(sd, f"{pre}.ffns.0", C, 2048)
    return sd


def test_full_psgtr_checkpoint_roundtrip():
    from pairnet_tpu.models.heads.psgtr_head import PSGTrHead
    from pairnet_tpu.utils.torch_convert import convert_psgtr_checkpoint

    C, n_cls, n_rel, Q, width = 64, 7, 5, 10, 16
    sd = {}
    # backbone (reuse the ResNet fixture from the full builder)
    full = _make_reference_state_dict(width=width)
    sd.update({k: v for k, v in full.items() if k.startswith("backbone.")})
    h = "bbox_head."
    _conv(sd, f"{h}input_proj", width * 32, C, 1)
    sd[f"{h}query_embed.weight"] = torch.randn(Q, C)
    for i in range(2):
        pre = f"{h}transformer.encoder.layers.{i}"
        _mha(sd, f"{pre}.attentions.0.attn", C)
        _norm(sd, f"{pre}.norms.0", C)
        _norm(sd, f"{pre}.norms.1", C)
        _ffn(sd, f"{pre}.ffns.0", C, 2048)
    for i in range(2):
        pre = f"{h}transformer.decoder.layers.{i}"
        _mha(sd, f"{pre}.attentions.0.attn", C)
        _mha(sd, f"{pre}.attentions.1.attn", C)
        for n in range(3):
            _norm(sd, f"{pre}.norms.{n}", C)
        _ffn(sd, f"{pre}.ffns.0", C, 2048)
    _norm(sd, f"{h}transformer.decoder.post_norm", C)
    for name, dout in (("sub_cls_embed", n_cls + 1), ("obj_cls_embed", n_cls + 1),
                       ("rel_cls_embed", n_rel + 1)):
        _lin(sd, f"{h}{name}", C, dout)
    for name in ("sub_box_embed", "obj_box_embed"):
        _lin(sd, f"{h}{name}.layers.0", C, C)
        _lin(sd, f"{h}{name}.layers.1", C, C)
        _lin(sd, f"{h}{name}.layers.2", C, 4)
    heads = 4
    dim = C + heads
    inter = [dim, C // 2, C // 4, C // 8, C // 16, max(C // 64, 1)]
    fpn_dims = [width * 16, width * 8, width * 4]  # C4, C3, C2
    for side in ("sub", "obj"):
        _lin(sd, f"{h}{side}_bbox_attention.q_linear", C, C)
        _lin(sd, f"{h}{side}_bbox_attention.k_linear", C, C)
        mh = f"{h}{side}_mask_head"
        _conv(sd, f"{mh}.lay1", dim, dim, 3)
        _norm(sd, f"{mh}.gn1", dim)
        for j in range(2, 6):
            _conv(sd, f"{mh}.lay{j}", inter[j - 2] if j > 2 else dim, inter[j - 1], 3)
            _norm(sd, f"{mh}.gn{j}", inter[j - 1])
        for j in range(1, 4):
            _conv(sd, f"{mh}.adapter{j}", fpn_dims[j - 1], inter[j], 1)
        _conv(sd, f"{mh}.out_lay", inter[4], 1, 3)

    head = PSGTrHead(
        num_classes=n_cls, num_relations=n_rel, num_query=Q, embed_dims=C,
        num_heads=heads, num_encoder_layers=2, num_decoder_layers=2,
    )
    model = PSGTr(backbone=ResNet(depth=50, base_width=width), bbox_head=head)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )
    converted = convert_psgtr_checkpoint(sd)
    merged = merge_pretrained(dict(variables), converted)
    got = merged["params"]["bbox_head"]["sub_mask_head"]["out_lay"]["kernel"]
    want = sd["bbox_head.sub_mask_head.out_lay.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)
    got = merged["params"]["bbox_head"]["transformer"]["dec_1"]["cross_attn"]["q_proj"]["bias"]
    want = sd["bbox_head.transformer.decoder.layers.1.attentions.1.attn.in_proj_bias"].numpy()[:C]
    np.testing.assert_allclose(np.asarray(got), want)


def test_full_psgformer_checkpoint_roundtrip():
    from pairnet_tpu.models.heads.psgformer_head import PSGFormerHead
    from pairnet_tpu.utils.torch_convert import convert_psgformer_checkpoint

    C, n_cls, n_rel, Q, K, width = 64, 7, 5, 10, 8, 16
    full = _make_reference_state_dict(width=width)
    sd = {k: v for k, v in full.items() if k.startswith("backbone.")}
    h = "bbox_head."
    _conv(sd, f"{h}input_proj", width * 32, C, 1)
    sd[f"{h}obj_query_embed.weight"] = torch.randn(Q, C)
    sd[f"{h}rel_query_embed.weight"] = torch.randn(K, C)
    for i in range(2):
        pre = f"{h}transformer.encoder.layers.{i}"
        _mha(sd, f"{pre}.attentions.0.attn", C)
        _norm(sd, f"{pre}.norms.0", C)
        _norm(sd, f"{pre}.norms.1", C)
        _ffn(sd, f"{pre}.ffns.0", C, 2048)
    for dec in ("decoder1", "decoder2"):
        for i in range(2):
            pre = f"{h}transformer.{dec}.layers.{i}"
            _mha(sd, f"{pre}.attentions.0.attn", C)
            _mha(sd, f"{pre}.attentions.1.attn", C)
            for n in range(3):
                _norm(sd, f"{pre}.norms.{n}", C)
            _ffn(sd, f"{pre}.ffns.0", C, 2048)
        _norm(sd, f"{h}transformer.{dec}.post_norm", C)
    _lin(sd, f"{h}class_embed", C, n_cls + 1)
    for j in range(3):
        _lin(sd, f"{h}box_embed.layers.{j}", C, 4 if j == 2 else C)
    for name, dout in (("sub_query_update", C), ("obj_query_update", C),
                       ("rel_cls_embed", n_rel + 1)):
        _lin(sd, f"{h}{name}.0", C, C)
        _lin(sd, f"{h}{name}.2", C, dout)
    heads = 4
    dim = C + heads
    inter = [dim, C // 2, C // 4, C // 8, C // 16, max(C // 64, 1)]
    fpn_dims = [width * 16, width * 8, width * 4]
    _lin(sd, f"{h}bbox_attention.q_linear", C, C)
    _lin(sd, f"{h}bbox_attention.k_linear", C, C)
    mh = f"{h}mask_head"
    _conv(sd, f"{mh}.lay1", dim, dim, 3)
    _norm(sd, f"{mh}.gn1", dim)
    for j in range(2, 6):
        _conv(sd, f"{mh}.lay{j}", inter[j - 2] if j > 2 else dim, inter[j - 1], 3)
        _norm(sd, f"{mh}.gn{j}", inter[j - 1])
    for j in range(1, 4):
        _conv(sd, f"{mh}.adapter{j}", fpn_dims[j - 1], inter[j], 1)
    _conv(sd, f"{mh}.out_lay", inter[4], 1, 3)

    head = PSGFormerHead(
        num_classes=n_cls, num_relations=n_rel, num_obj_query=Q,
        num_rel_query=K, embed_dims=C, num_heads=heads,
        num_encoder_layers=2, num_decoder_layers=2,
    )
    model = PSGTr(backbone=ResNet(depth=50, base_width=width), bbox_head=head)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )
    converted = convert_psgformer_checkpoint(sd)
    merged = merge_pretrained(dict(variables), converted)
    got = merged["params"]["bbox_head"]["rel_cls_embed"]["layers_1"]["kernel"]
    want = sd["bbox_head.rel_cls_embed.2.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(got), want)
    got = merged["params"]["bbox_head"]["transformer"]["dec2_post_norm"]["scale"]
    want = sd["bbox_head.transformer.decoder2.post_norm.weight"].numpy()
    np.testing.assert_allclose(np.asarray(got), want)


def test_full_baseline_checkpoint_roundtrip():
    from pairnet_tpu.models.heads.baseline_head import BaselineHead
    from pairnet_tpu.utils.torch_convert import convert_baseline_checkpoint

    C, n_cls, n_rel, Q, K = 32, 7, 5, 20, 16
    sd = _make_reference_state_dict(C=C, n_cls=n_cls, n_rel=n_rel, Q=Q, K=K)
    # strip the Pair-Net-only parts, add the baseline rel classifier (R+1)
    for k in list(sd):
        if "update_importance" in k or "rel_query_embed2" in k or "rel_query_embed3" in k:
            del sd[k]
    _lin(sd, "bbox_head.rel_cls_embed", C, n_rel + 1)

    head = BaselineHead(
        num_classes=n_cls, num_relations=n_rel, num_obj_query=Q,
        num_rel_query=K, embed_dims=C, num_heads=4, num_decoder_layers=3,
        num_relation_layers=2, pixel_decoder_layers=1,
    )
    model = PSGTr(backbone=ResNet(depth=50, base_width=8), bbox_head=head)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )
    converted = convert_baseline_checkpoint(sd)
    merged = merge_pretrained(dict(variables), converted)
    got = merged["params"]["bbox_head"]["rel_cls_embed"]["kernel"]
    want = sd["bbox_head.rel_cls_embed.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(got), want)
    got = merged["params"]["bbox_head"]["rel_query_feat"]
    np.testing.assert_allclose(
        np.asarray(got), sd["bbox_head.rel_query_feat.weight"].numpy()
    )


def test_full_pairnet_checkpoint_roundtrip():
    head = PairNetHead(
        num_classes=7, num_relations=5, num_obj_query=20, num_rel_query=16,
        embed_dims=32, num_heads=4, num_decoder_layers=3,
        num_relation_layers=2, pixel_decoder_layers=1,
    )
    model = PSGTr(backbone=ResNet(depth=50, base_width=8), bbox_head=head)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )

    sd = _make_reference_state_dict()
    converted = convert_pairnet_checkpoint(sd)
    merged = merge_pretrained(dict(variables), converted)

    # every converted tensor must have landed with matching shape; packed
    # MHA in_proj tensors split into q/k/v (+4 leaves per attention module:
    # 3 decoder layers x2 + 2 relation layers x2 = 10 modules)
    flat_conv = jax.tree_util.tree_leaves(converted)
    assert len(flat_conv) == len(sd) + 4 * 10
    # spot-check values survived the overlay
    got = merged["params"]["bbox_head"]["rel_cls_embed"]["kernel"]
    want = sd["bbox_head.rel_cls_embed.weight"].numpy().T
    np.testing.assert_allclose(np.asarray(got), want)
    got = merged["constants"]["backbone"]["layer3_2"]["bn2"]["running_var"]
    want = sd["backbone.layer3.2.bn2.running_var"].numpy()
    np.testing.assert_allclose(np.asarray(got), want)
