"""Backbone factory.

Reference: /root/reference/model/get_video_backbones.py:11-31
(`video_motion_extractor`).  Each backbone is a flax module with the pyramid
contract: __call__(clips [B,16,H,W,3], train) -> [v1, v2, v3, v4]
channels-last feature maps at spatial strides 4/8/16/32 with the channel/
temporal dims from mspi_tpu.config.MOTION_ENCODER_{EMBEDS,TDIMS}.

Input wrapping quirks (e.g. SlowFast's two-pathway frame subsampling,
model_utils.py:521-532) live *inside* the backbone modules, so the fusion
model is backbone-agnostic.
"""

from __future__ import annotations

from flax import linen as nn

from mspi_tpu.config import MSPIConfig


def build_backbone(cfg: MSPIConfig) -> nn.Module:
    name = cfg.model.motion_encoder
    if name == "s3d":
        from mspi_tpu.models.s3d import S3DFeatures

        return S3DFeatures(pool=cfg.model.s3d.pool_stride)
    if name == "morphmlps":
        from mspi_tpu.models.morphmlp import MorphMLPFeatures

        return MorphMLPFeatures(cfg=cfg.model.morph)
    if name == "x3dl":
        from mspi_tpu.models.x3d import X3DFeatures

        return X3DFeatures(cfg=cfg.model.x3d)
    if name == "slowfast4x16":
        from mspi_tpu.models.slowfast import SlowFastFeatures

        return SlowFastFeatures(cfg=cfg.model.slowfast)
    if name == "uniformerb":
        from mspi_tpu.models.uniformer import UniFormerFeatures

        return UniFormerFeatures(cfg=cfg.model.uniformer)
    if name == "videoswins":
        from mspi_tpu.models.videoswin import VideoSwinFeatures

        return VideoSwinFeatures(cfg=cfg.model.videoswin,
                                 remat=cfg.model.remat)
    if name == "mvitv2s":
        from mspi_tpu.models.mvit import MViTFeatures

        return MViTFeatures(cfg=cfg.model.mvit, remat=cfg.model.remat)
    raise ValueError(f"unknown motion encoder: {name!r}")
