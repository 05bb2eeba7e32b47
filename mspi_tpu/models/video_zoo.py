"""Standalone video-classification model zoo.

Reference: SlowFast/slowfast/models/video_model_builder.py:173-810 builds
full K400 classifiers (SlowFast, ResNet/Slow-only, X3D, MViT) with heads;
MSPI only consumes the feature trunks, but the vendored framework ships the
classifiers — this module provides the same capability on top of the
feature extractors in this package.

Each classifier = feature trunk (mspi_tpu.models.{slowfast,x3d,mvit,...}) +
head (mspi_tpu.models.heads), trainable via mspi_tpu/train/classification.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import (MViTConfig, SlowFastConfig, UniFormerConfig,
                             VideoSwinConfig, X3DConfig)
from mspi_tpu.models.heads import ResNetBasicHead, TransformerBasicHead, X3DHead


class SlowFastClassifier(nn.Module):
    """SlowFast 4x16 R50 K400 classifier (video_model_builder.py:173-445).

    Head consumes the final slow+fast pathway features: for beta_inv=8 the
    dims are (2048, 256)."""

    cfg: SlowFastConfig
    num_classes: int = 400
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.slowfast import SlowFastFeatures

        self.backbone = SlowFastFeatures(cfg=self.cfg)
        w = self.cfg.width_per_group
        self.head = ResNetBasicHead(
            dim_in=[w * 32 + w * 32 // (self.cfg.beta_inv // self.cfg.fusion_conv_channel_ratio)],
            num_classes=self.num_classes, dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.backbone(clips, train=train)
        return self.head([feats[-1]], train=train, rng=rng)


class X3DClassifier(nn.Module):
    """X3D K400 classifier (video_model_builder.py:664-808 + X3DHead)."""

    cfg: X3DConfig
    num_classes: int = 400
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.resnet3d import round_width
        from mspi_tpu.models.x3d import X3DFeatures

        self.backbone = X3DFeatures(cfg=self.cfg)
        dim_res5 = 96  # X3D-L s5 pre-width-mul dim
        dim_out = round_width(dim_res5 * 2, self.cfg.width_factor)
        dim_inner = int(self.cfg.bottleneck_factor * dim_out)
        self.head = X3DHead(dim_in=dim_out, dim_inner=dim_inner,
                            dim_out=self.cfg.dim_c5,
                            num_classes=self.num_classes,
                            dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.backbone(clips, train=train)
        return self.head([feats[-1]], train=train, rng=rng)


class MViTClassifier(nn.Module):
    """MViTv2 K400 classifier (video_model_builder.py MViT + head)."""

    cfg: MViTConfig
    num_classes: int = 400
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.mvit import MViTFeatures

        self.backbone = MViTFeatures(cfg=self.cfg)
        self.head = TransformerBasicHead(dim_in=768, num_classes=self.num_classes,
                                         dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.backbone(clips, train=train)
        return self.head(feats[-1], train=train, rng=rng)


def build_classifier(name: str, num_classes: int = 400) -> nn.Module:
    if name == "slowfast4x16":
        return SlowFastClassifier(cfg=SlowFastConfig(), num_classes=num_classes)
    if name == "x3dl":
        return X3DClassifier(cfg=X3DConfig(), num_classes=num_classes)
    if name == "mvitv2s":
        return MViTClassifier(cfg=MViTConfig(), num_classes=num_classes)
    raise ValueError(f"unknown classifier {name!r}")
