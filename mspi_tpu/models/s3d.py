"""S3D video backbone (separable 3-D Inception), channels-last.

Reference: /root/reference/backbones/s3d.py (`S3D_features_only`,
kylemin/S3D as used by TASED-Net).  Emits the 4-level pyramid
[base1, base2, base3, base4] at strides 4/8/16/32 with channels
(192, 480, 832, 1024) and temporal dims (8, 8, 4, 4) for a 16-frame clip
(reference config.py:68, forward at s3d.py:406-418).

TPU notes: every SepConv3d is a spatial 1xkxk conv followed by a temporal
kx1x1 conv — both lower to MXU-friendly contractions in channels-last
layout; BN(eps=1e-3, momentum=0.001) matches the S3D release exactly
(s3d.py:45).  Module scopes mirror the torch names so
`S3D_kinetics400_rm_fc.pt` converts mechanically.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import MaxPool, Sequential, batchnorm, conv3d, stem_conv3d

BN_EPS = 1e-3
BN_MOMENTUM = 0.001


class BasicConv3d(nn.Module):
    """conv(bias=False) + BN(1e-3, 0.001) + ReLU (s3d.py:41-52)."""

    in_features: int
    features: int
    kernel_size: int | Tuple[int, int, int]
    stride: int | Tuple[int, int, int] = 1
    padding: int | Tuple[int, int, int] = 0

    def setup(self):
        self.conv = conv3d(self.in_features, self.features, self.kernel_size,
                           self.stride, self.padding, bias=False)
        self.bn = batchnorm(momentum=BN_MOMENTUM, epsilon=BN_EPS)

    def __call__(self, x, train: bool = False):
        return jnp.maximum(self.bn(self.conv(x), use_running_average=not train), 0)


class SepConv3d(nn.Module):
    """Spatial (1,k,k) conv+BN+ReLU then temporal (k,1,1) conv+BN+ReLU
    (s3d.py:95-116)."""

    in_features: int
    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0

    def setup(self):
        k, s, p = self.kernel_size, self.stride, self.padding
        # the 3-channel stem instance (base1's SepConv3d(3,64,7,2,3)) runs
        # ~10x off the MXU roofline as a plain conv; stem_conv3d lowers it
        # via space-to-depth (exact) and is a no-op pass-through for s == 1
        conv_fn = stem_conv3d if self.in_features <= 4 else (
            lambda *a, bias: conv3d(*a, bias=bias))
        self.conv_s = conv_fn(self.in_features, self.features, (1, k, k),
                              (1, s, s), (0, p, p), bias=False)
        self.bn_s = batchnorm(momentum=BN_MOMENTUM, epsilon=BN_EPS)
        self.conv_t = conv3d(self.features, self.features, (k, 1, 1),
                             (s, 1, 1), (p, 0, 0), bias=False)
        self.bn_t = batchnorm(momentum=BN_MOMENTUM, epsilon=BN_EPS)

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jnp.maximum(self.bn_s(self.conv_s(x), use_running_average=ra), 0)
        x = jnp.maximum(self.bn_t(self.conv_t(x), use_running_average=ra), 0)
        return x


class Mixed(nn.Module):
    """Inception mix block: 1x1 / 1x1+sep3 / 1x1+sep3 / pool+1x1 branches
    concatenated on channels (s3d.py:118-376; the per-block channel tables
    below are the Mixed_3b..Mixed_5c configurations)."""

    in_features: int
    b0: int
    b1: Tuple[int, int]
    b2: Tuple[int, int]
    b3: int

    def setup(self):
        cin = self.in_features
        self.branch0 = Sequential([BasicConv3d(cin, self.b0, 1, 1)])
        self.branch1 = Sequential([
            BasicConv3d(cin, self.b1[0], 1, 1),
            SepConv3d(self.b1[0], self.b1[1], 3, 1, 1),
        ])
        self.branch2 = Sequential([
            BasicConv3d(cin, self.b2[0], 1, 1),
            SepConv3d(self.b2[0], self.b2[1], 3, 1, 1),
        ])
        self.branch3 = Sequential([
            MaxPool((3, 3, 3), 1, 1),
            BasicConv3d(cin, self.b3, 1, 1),
        ])

    def __call__(self, x, train: bool = False):
        return jnp.concatenate(
            [self.branch0(x, train=train), self.branch1(x, train=train),
             self.branch2(x, train=train), self.branch3(x, train=train)],
            axis=-1,
        )

    @property
    def out_features(self):
        return self.b0 + self.b1[1] + self.b2[1] + self.b3


# (in, b0, (b1a, b1b), (b2a, b2b), b3) for Mixed_3b..Mixed_5c
MIXED_SPECS = {
    "3b": (192, 64, (96, 128), (16, 32), 32),     # -> 256
    "3c": (256, 128, (128, 192), (32, 96), 64),   # -> 480
    "4b": (480, 192, (96, 208), (16, 48), 64),    # -> 512
    "4c": (512, 160, (112, 224), (24, 64), 64),   # -> 512
    "4d": (512, 128, (128, 256), (24, 64), 64),   # -> 512
    "4e": (512, 112, (144, 288), (32, 64), 64),   # -> 528
    "4f": (528, 256, (160, 320), (32, 128), 128), # -> 832
    "5b": (832, 256, (160, 320), (32, 128), 128), # -> 832
    "5c": (832, 384, (192, 384), (48, 128), 128), # -> 1024
}


def _mixed(name: str) -> Mixed:
    cin, b0, b1, b2, b3 = MIXED_SPECS[name]
    return Mixed(cin, b0, b1, b2, b3)


class S3DFeatures(nn.Module):
    """S3D_features_only (s3d.py:379-418): 4-level pyramid extractor.

    input [B, 16, H, W, 3] -> [v1 [B,8,H/4,W/4,192], v2 [B,8,H/8,W/8,480],
    v3 [B,4,H/16,W/16,832], v4 [B,4,H/32,W/32,1024]].
    """

    pool: int = 1  # cfg.MODEL.S3D.POOL_STRIDE

    def setup(self):
        self.base1 = Sequential([
            SepConv3d(3, 64, 7, 2, 3),
            MaxPool((1, 3, 3), (1, 2, 2), (0, 1, 1)),
            BasicConv3d(64, 64, 1, 1),
            SepConv3d(64, 192, 3, 1, 1),
        ])
        self.maxpooling2 = MaxPool((1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.base2 = Sequential([_mixed("3b"), _mixed("3c")])
        self.maxpooling3 = MaxPool((3, 3, 3), (2, 2, 2), (1, 1, 1))
        self.base3 = Sequential([_mixed("4b"), _mixed("4c"), _mixed("4d"),
                                 _mixed("4e"), _mixed("4f")])
        self.maxpooling4 = MaxPool((self.pool, 2, 2), (self.pool, 2, 2), 0)
        self.base4 = Sequential([_mixed("5b"), _mixed("5c")])

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        base1 = self.base1(x, train=train)
        base2 = self.base2(self.maxpooling2(base1), train=train)
        base3 = self.base3(self.maxpooling3(base2), train=train)
        base4 = self.base4(self.maxpooling4(base3), train=train)
        return [base1, base2, base3, base4]
