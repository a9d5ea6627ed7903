"""Import all model modules so config-string registries are populated."""

from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.backbones.swin import SwinTransformer
from pairnet_tpu.models.frameworks.panoptic_fpn import PanopticFPN
from pairnet_tpu.models.frameworks.psgtr import PSGTr, build_model
from pairnet_tpu.models.frameworks.twostage import SceneGraphTwoStage
from pairnet_tpu.models.heads.baseline_head import BaselineHead
from pairnet_tpu.models.heads.detr4seg_head import Detr4SegHead
from pairnet_tpu.models.heads import diagnostic as _diagnostic  # noqa: F401
from pairnet_tpu.models.heads.pairnet_bbox_head import CrossHeadBBox
from pairnet_tpu.models.heads.pairnet_head import PairNetHead
from pairnet_tpu.models.heads.psgformer_head import PSGFormerHead
from pairnet_tpu.models.heads.psgtr2_head import PSGTr2Head
from pairnet_tpu.models.heads.psgtr_head import PSGTrHead
from pairnet_tpu.models.heads.twostage.heads import GPSHead, IMPHead, MotifHead
from pairnet_tpu.models.heads.twostage.vctree import VCTreeHead
from pairnet_tpu.models.heads.baseline_head import MyPSGFormerHead
