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

import jax
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


# Single-pathway ResNet video classifiers (video_model_builder.py:447-663):
# per-arch conv1/res2..res5 temporal kernels (_TEMPORAL_KERNEL_BASIS :41-99)
# and the post-res2 temporal pool (_POOL1 :100-109).
_RESNET_TEMP_KERNELS = {
    "c2d": ([1], [1], [1], [1], [1]),
    "i3d": ([5], [3], [3, 1], [3, 1], [1, 3]),
    "slow": ([1], [1], [1], [3], [3]),
}
_RESNET_POOL1 = {"c2d": (2, 1, 1), "i3d": (2, 1, 1), "slow": (1, 1, 1)}
# i3d/slow NLN-R50: nonlocal after blocks [1,3] of res3 and [1,3,5] of res4
# (configs/Kinetics/*_NLN_8x8_R50.yaml NONLOCAL.LOCATION).
_NLN_LOCATIONS = ((), (1, 3), (1, 3, 5), ())


class ResNetVideoClassifier(nn.Module):
    """ResNet-50 video classifier: c2d / i3d / slow arches with optional
    non-local insertion (video_model_builder.py ResNet + resnet_helper
    nonlocal plumbing).  Param tree mirrors the torch module names
    (s1/pathway0_stem, s2..s5/pathway0_res{i}, pathway0_nonlocal{i}, head)."""

    arch: str = "slow"
    num_classes: int = 400
    depth: int = 50
    width_per_group: int = 64
    num_groups: int = 1
    dropout_rate: float = 0.5
    use_nonlocal: bool = False
    nonlocal_group: int = 1
    nonlocal_pool: Tuple[int, int, int] = (1, 2, 2)

    def setup(self):
        from mspi_tpu.models.resnet3d import ResStage, VideoModelStem

        assert self.arch in _RESNET_TEMP_KERNELS, self.arch
        assert self.depth == 50, "R50 block counts (3,4,6,3)"
        tk = _RESNET_TEMP_KERNELS[self.arch]
        w = self.width_per_group
        dim_inner = self.num_groups * w
        blocks = (3, 4, 6, 3)
        self.s1 = VideoModelStem(
            dim_in=[3], dim_out=[w], kernel=[(tk[0][0], 7, 7)],
            stride=[(1, 2, 2)], padding=[(tk[0][0] // 2, 3, 3)])
        dims = [(w, w * 4), (w * 4, w * 8), (w * 8, w * 16), (w * 16, w * 32)]
        for s, ((din, dout), nb) in enumerate(zip(dims, blocks), start=2):
            nl_inds = (_NLN_LOCATIONS[s - 2],) if self.use_nonlocal else ()
            setattr(self, f"s{s}", ResStage(
                dim_in=[din], dim_out=[dout],
                stride=[1 if s == 2 else 2],
                temp_kernel_sizes=[tk[s - 1]], num_blocks=[nb],
                dim_inner=[dim_inner * (2 ** (s - 2))],
                num_groups=[self.num_groups], num_block_temp_kernel=[nb],
                nonlocal_inds=nl_inds,
                nonlocal_group=(self.nonlocal_group,) if self.use_nonlocal else (),
                nonlocal_pool=(self.nonlocal_pool,) if self.use_nonlocal else ()))
        self.head = ResNetBasicHead(dim_in=[w * 32],
                                    num_classes=self.num_classes,
                                    dropout_rate=self.dropout_rate)

    def features(self, clips, train: bool = False):
        from mspi_tpu.ops import max_pool

        xs = self.s1([clips], train=train)
        xs = self.s2(xs, train=train)
        p = _RESNET_POOL1[self.arch]
        if any(s > 1 for s in p):
            xs = [max_pool(x, p, p, 0) for x in xs]
        v2 = xs[0]
        xs = self.s3(xs, train=train)
        v3 = xs[0]
        xs = self.s4(xs, train=train)
        v4 = xs[0]
        xs = self.s5(xs, train=train)
        return [v2, v3, v4, xs[0]]

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.features(clips, train=train)
        return self.head([feats[-1]], train=train, rng=rng)


class UniFormerClassifier(nn.Module):
    """UniFormer K400 classifier (reference backbones/uniformer.py:280-381:
    stages -> BN3d norm -> global avg pool -> Linear head)."""

    cfg: UniFormerConfig
    num_classes: int = 400
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.uniformer import UniFormerFeatures
        from mspi_tpu.ops.layers import batchnorm

        self.backbone = UniFormerFeatures(cfg=self.cfg)
        self.norm = batchnorm()
        self.head = TransformerBasicHead(dim_in=self.cfg.embed_dim[-1],
                                         num_classes=self.num_classes,
                                         dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.backbone(clips, train=train)
        x = self.norm(feats[-1], use_running_average=not train)
        return self.head(x, train=train, rng=rng)  # head mean-pools T,H,W


class VideoSwinClassifier(nn.Module):
    """Video Swin K400 classifier (mmaction2 recipe the reference's
    pretrained VideoSwin checkpoints come from: SwinTransformer3D trunk ->
    final LayerNorm -> I3D-style avg pool + dropout + fc)."""

    cfg: VideoSwinConfig
    num_classes: int = 400
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.videoswin import VideoSwinFeatures
        from mspi_tpu.ops.layers import layernorm

        self.backbone = VideoSwinFeatures(cfg=self.cfg)
        dim = int(self.cfg.embed_dim * 2 ** (len(self.cfg.depths) - 1))
        self.norm = layernorm()
        self.head = TransformerBasicHead(dim_in=dim,
                                         num_classes=self.num_classes,
                                         dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        feats = self.backbone(clips, train=train)
        x = self.norm(feats[-1])
        return self.head(x, train=train, rng=rng)


class _ConvStem(nn.Module):
    """conv-BN-ReLU stem without pooling (pytorchvideo stems used by the
    reference's ptv_model_builder: CSN (3,7,7), R(2+1)D (1,7,7))."""

    dim_out: int
    kernel: tuple
    stride: tuple = (1, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mspi_tpu.ops.layers import batchnorm, conv3d

        pad = tuple(k // 2 for k in self.kernel)
        x = conv3d(3, self.dim_out, self.kernel, self.stride, pad,
                   bias=False, name="conv")(x)
        x = batchnorm(name="bn")(x, use_running_average=not train)
        return jax.nn.relu(x)


class _PTVStyleResNet(nn.Module):
    """Single-pathway ResNet-50 with a pluggable bottleneck transform —
    the capability of the reference's PyTorchVideo adapters
    (SlowFast/slowfast/models/ptv_model_builder.py: PTVCSN :14,
    PTVR2plus1D :20-21).  temporal_pool_stages downsamples T between
    stages ((2+1)D uses temporal stride in res4/res5)."""

    trans_func: str
    stem_kernel: tuple
    num_classes: int = 400
    temp_kernel: int = 3
    temporal_pool_stages: tuple = ()
    dropout_rate: float = 0.5

    def setup(self):
        from mspi_tpu.models.resnet3d import ResStage

        w = 64
        self.s1 = _ConvStem(dim_out=w, kernel=self.stem_kernel)
        dims = [(w, w * 4), (w * 4, w * 8), (w * 8, w * 16), (w * 16, w * 32)]
        blocks = (3, 4, 6, 3)
        for s, ((din, dout), nb) in enumerate(zip(dims, blocks), start=2):
            setattr(self, f"s{s}", ResStage(
                dim_in=[din], dim_out=[dout],
                stride=[1 if s == 2 else 2],
                temp_kernel_sizes=[[self.temp_kernel]], num_blocks=[nb],
                dim_inner=[w * (2 ** (s - 2))], num_groups=[1],
                num_block_temp_kernel=[nb], trans_func_name=self.trans_func))
        self.head = ResNetBasicHead(dim_in=[w * 32],
                                    num_classes=self.num_classes,
                                    dropout_rate=self.dropout_rate)

    def __call__(self, clips, train: bool = False, rng=None):
        from mspi_tpu.ops import avg_pool

        xs = [self.s1(clips, train=train)]
        for s in (2, 3, 4, 5):
            if s in self.temporal_pool_stages and xs[0].shape[1] > 1:
                xs = [avg_pool(xs[0], (2, 1, 1), (2, 1, 1), 0)]
            xs = getattr(self, f"s{s}")(xs, train=train)
        return self.head(xs, train=train, rng=rng)


def build_classifier(name: str, num_classes: int = 400) -> nn.Module:
    if name == "slowfast4x16":
        return SlowFastClassifier(cfg=SlowFastConfig(), num_classes=num_classes)
    if name == "x3dl":
        return X3DClassifier(cfg=X3DConfig(), num_classes=num_classes)
    if name == "mvitv2s":
        return MViTClassifier(cfg=MViTConfig(), num_classes=num_classes)
    if name == "uniformerb":
        return UniFormerClassifier(cfg=UniFormerConfig(), num_classes=num_classes)
    if name == "videoswins":
        return VideoSwinClassifier(cfg=VideoSwinConfig(), num_classes=num_classes)
    if name == "csn":
        return _PTVStyleResNet(trans_func="csn_transform",
                               stem_kernel=(3, 7, 7), num_classes=num_classes)
    if name == "r2plus1d":
        return _PTVStyleResNet(trans_func="r2plus1d_transform",
                               stem_kernel=(1, 7, 7),
                               temporal_pool_stages=(4, 5),
                               num_classes=num_classes)
    if name in ("c2d", "i3d", "slow"):
        return ResNetVideoClassifier(arch=name, num_classes=num_classes)
    if name.endswith("_nln") and name[:-4] in ("c2d", "i3d", "slow"):
        return ResNetVideoClassifier(arch=name[:-4], num_classes=num_classes,
                                     use_nonlocal=True)
    raise ValueError(f"unknown classifier {name!r}")
