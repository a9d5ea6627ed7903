from pairnet_tpu.models.backbones.resnet import ResNet
from pairnet_tpu.models.heads.pairnet_head import PairNetHead
from pairnet_tpu.models.frameworks.psgtr import PSGTr, build_model
