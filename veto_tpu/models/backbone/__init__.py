from .resnet import ResNetFPNBackbone, ResNetBody, FrozenBatchNorm  # noqa: F401
from .fpn import FPN  # noqa: F401
from .depth_resnet import DepthResNet18  # noqa: F401
from .vgg import VGG16Body  # noqa: F401
