"""Audio encoder: ResNet18 with a 1-channel stem, no pool/fc head.

Reference: /root/reference/backbones/resnet.py:17-155 (`get_resnet18`,
`ResNet(BasicBlock, [2,2,2,2])` trained on VGGSound).  For the (1,257,111)
log-spectrogram input it emits a [B, 9, 4, 512] channels-last feature map
(torch layout [B,512,9,4]) whose 36 positions become the audio tokens of the
cross-modal SyncBlock (model_utils.py:224).

The module tree mirrors the torch names (conv1/bn1/layer{1..4}.{0,1}.conv1...)
so the released `resnet18_vggsound.pt` converts mechanically.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import Sequential, batchnorm, conv2d, max_pool


class Downsample(nn.Module):
    """1x1 strided conv + BN shortcut (torch nn.Sequential[conv1x1, BN])."""

    in_features: int
    features: int
    stride: int

    def setup(self):
        self.layers = [
            conv2d(self.in_features, self.features, 1, stride=self.stride, bias=False),
            batchnorm(),
        ]

    def __call__(self, x, train: bool = False):
        x = self.layers[0](x)
        x = self.layers[1](x, use_running_average=not train)
        return x


class BasicBlock(nn.Module):
    in_features: int
    features: int
    stride: int = 1
    has_downsample: bool = False

    def setup(self):
        self.conv1 = conv2d(self.in_features, self.features, 3, stride=self.stride,
                            padding=1, bias=False)
        self.bn1 = batchnorm()
        self.conv2 = conv2d(self.features, self.features, 3, padding=1, bias=False)
        self.bn2 = batchnorm()
        if self.has_downsample:
            self.downsample = Downsample(self.in_features, self.features, self.stride)

    def __call__(self, x, train: bool = False):
        identity = x
        out = jnp.maximum(self.bn1(self.conv1(x), use_running_average=not train), 0)
        out = self.bn2(self.conv2(out), use_running_average=not train)
        if self.has_downsample:
            identity = self.downsample(x, train)
        return jnp.maximum(out + identity, 0)


class AudioResNet18(nn.Module):
    """forward: [B, F, Tw, 1] (channels-last spectrogram) -> [B, 9, 4, 512]."""

    layers_per_stage: Sequence[int] = (2, 2, 2, 2)

    def setup(self):
        self.conv1 = conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = batchnorm()
        widths = (64, 128, 256, 512)
        stages = []
        in_f = 64
        for i, (w, n) in enumerate(zip(widths, self.layers_per_stage)):
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(
                    BasicBlock(in_f, w, stride=stride,
                               has_downsample=(stride != 1 or in_f != w))
                )
                in_f = w
            stages.append(Sequential(blocks))
        self.layer1, self.layer2, self.layer3, self.layer4 = stages

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = jnp.maximum(self.bn1(self.conv1(x), use_running_average=not train), 0)
        x = max_pool(x, 3, 2, 1, ndim=2)
        x = self.layer1(x, train=train)
        x = self.layer2(x, train=train)
        x = self.layer3(x, train=train)
        x = self.layer4(x, train=train)
        return x
