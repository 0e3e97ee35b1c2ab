"""Depth backbone: ResNet-18 truncated after layer3, 1-channel input.

Re-design of the reference ResNetDepth (pysgg/modeling/backbone/
resnet_depth.py:12-47): torchvision resnet18 with conv1 changed to 1 input
channel, layer4/avgpool/fc removed → a 256-channel stride-16 feature map.

Unlike the RGB detector backbone this module is TRAINED during relation
training (relation_train_net.py:167-170 train_modules), so BatchNorm here
keeps live batch statistics (flax BatchNorm with a `batch_stats` collection)
rather than the frozen fold used for the detector.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs + BN, identity/projection skip."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        shortcut = x
        if x.shape[-1] != self.features or self.stride != 1:
            shortcut = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            shortcut = norm("downsample_bn")(shortcut)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        return nn.relu(y + shortcut)


class DepthResNet18(nn.Module):
    """(B, H, W, 1) depth image → (B, H/16, W/16, 256) feature map."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from veto_tpu.models.backbone.resnet import StemConv

        x = x.astype(self.dtype)
        # 7x7/2 stem as space-to-depth (exact; resnet.py stem_conv_s2d) —
        # the 1-channel depth contraction pads K 7*7*1→8-lane multiples on
        # the MXU; s2d(2) runs it as a 4x4/1 conv over 4 channels instead
        x = StemConv(features=64, use_bias=False, dtype=self.dtype,
                     name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (feats, stride) in enumerate(((64, 1), (128, 2), (256, 2))):
            for block in range(2):
                x = BasicBlock(
                    feats, stride if block == 0 else 1, dtype=self.dtype,
                    name=f"layer{stage + 1}_block{block}",
                )(x, train=train)
        return x
