"""Two-stage scene graph framework (predcls / sgcls / sgdet shell).

Counterpart of SceneGraphPanopticFPN / SceneGraphRCNN
(ref: pairnet/models/frameworks/sg_panoptic_fpn.py:144-481, sg_rcnn.py):
backbone -> FPN -> relation head. In predcls/sgcls the detections are the GT
boxes (ref: sg_panoptic_fpn.py:383-391); in sgdet a detector provides them —
the detector runs IN EVAL MODE even during training (ref: sg_panoptic_fpn.py:
166-202), so detections can equivalently be precomputed and fed through the
batch. Relation pair sampling runs on the host (fixed shapes; see
twostage/core.py sample_train_pairs).
"""

from __future__ import annotations

from flax import linen as nn

from pairnet_tpu.config.registry import MODELS
from pairnet_tpu.models.necks.fpn import FPN


@MODELS.register()
class SceneGraphTwoStage(nn.Module):
    backbone: nn.Module
    relation_head: nn.Module
    neck_channels: int = 256

    def setup(self):
        self.neck = FPN(out_channels=self.neck_channels, num_outs=4, name="neck")

    def __call__(self, batch, deterministic: bool = True):
        """batch: image + det_boxes/det_labels(1-based)/det_valid + pairs."""
        feats = self.backbone(batch["image"])
        fpn_feats = self.neck(feats)
        return self.relation_head(fpn_feats, batch, deterministic=deterministic)
