"""Unified configuration system.

The reference keeps *three* parallel config systems: an EasyDict literal tree
(`/root/reference/config.py:1-101`), a vendored fvcore CfgNode YAML tree
(`/root/reference/SlowFast/slowfast/config/defaults.py:19-1293`) and a third
copy for UniFormer (`/root/reference/backbones/Uniformer/defaults.py`).  Here
everything the 5 `configs/*.yaml` files and `config.py` actually touch is
folded into one dataclass tree with a YAML/dict overlay.

Backbone hyper-parameter defaults encode the values of
`/root/reference/configs/{MVITv2_S_16x4,SLOWFAST_4x16_R50,X3D_L,
K400_MLP_S16x4,uniformer_b16x4_k400}.yaml`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

MOTION_ENCODERS = (
    "mvitv2s",
    "s3d",
    "slowfast4x16",
    "morphmlps",
    "uniformerb",
    "videoswins",
    "x3dl",
)

# Channel dims of the [v1..v4] feature pyramid (reference config.py:66-74).
MOTION_ENCODER_EMBEDS: Dict[str, Tuple[int, int, int, int]] = {
    "mvitv2s": (96, 192, 384, 768),
    "s3d": (192, 480, 832, 1024),
    "slowfast4x16": (320, 640, 1280, 2048),
    "morphmlps": (112, 224, 392, 784),
    "uniformerb": (64, 128, 320, 512),
    "videoswins": (96, 192, 384, 768),
    "x3dl": (24, 48, 96, 192),
}

# Temporal length of each pyramid level for a 16-frame clip.
MOTION_ENCODER_TDIMS: Dict[str, Tuple[int, int, int, int]] = {
    "mvitv2s": (8, 8, 8, 8),
    "s3d": (8, 8, 4, 4),
    "slowfast4x16": (4, 4, 4, 4),
    "morphmlps": (8, 8, 8, 8),
    "uniformerb": (8, 8, 8, 8),
    "videoswins": (8, 8, 8, 8),
    "x3dl": (16, 16, 16, 16),
}

# Whether each lateral decoder layer applies a temporal-stride conv
# (reference config.py:39-47).
LATERAL_BOOL: Dict[str, Tuple[bool, bool, bool, bool]] = {
    "mvitv2s": (True, True, True, True),
    "s3d": (True, True, False, False),
    "slowfast4x16": (False, False, False, False),
    "morphmlps": (True, True, True, True),
    "uniformerb": (True, True, True, True),
    "videoswins": (True, True, True, True),
    "x3dl": (True, True, True, True),
}


@dataclass
class DataConfig:
    root: str = "./AuViDataset"
    num_frames: int = 16
    use_sound: bool = True
    resolution: Tuple[int, int] = (224, 384)
    # audio log-spectrogram geometry (avsp_dataloader.py:51-80)
    sample_rate: int = 16000
    n_fft: int = 512
    hop_length: int = 160
    spectro_shape: Tuple[int, int] = (257, 111)
    spectro_fill: float = 0.02


@dataclass
class TrainConfig:
    batch_size: int = 2
    save_ckpt_freq: int = 10
    gamma: float = 1.0  # weight of the SimSiam AV-alignment loss
    seed: int = 2023


@dataclass
class SolverConfig:
    lr: float = 1e-4
    min_lr: float = 1e-5
    max_epoch: int = 120
    optimizing_method: str = "adamw"
    weight_decay: float = 0.0
    monitored_epochs: Tuple[int, ...] = (60, 80, 100, 120)


@dataclass
class S3DConfig:
    pool_stride: int = 1  # cfg.MODEL.S3D.POOL_STRIDE


@dataclass
class MViTConfig:
    """MViTv2-S 16x4 (configs/MVITv2_S_16x4.yaml)."""

    depth: int = 16
    num_heads: int = 1
    embed_dim: int = 96
    patch_kernel: Tuple[int, int, int] = (3, 7, 7)
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    patch_padding: Tuple[int, int, int] = (1, 3, 3)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    mode: str = "conv"
    cls_embed_on: bool = False
    use_abs_pos: bool = False
    rel_pos_spatial: bool = True
    rel_pos_temporal: bool = True
    dim_mul: Tuple[Tuple[int, float], ...] = ((1, 2.0), (3, 2.0), (14, 2.0))
    head_mul: Tuple[Tuple[int, float], ...] = ((1, 2.0), (3, 2.0), (14, 2.0))
    pool_kvq_kernel: Tuple[int, int, int] = (3, 3, 3)
    pool_kv_stride_adaptive: Tuple[int, int, int] = (1, 8, 8)
    pool_q_stride: Tuple[Tuple[int, int, int, int], ...] = (
        (0, 1, 1, 1), (1, 1, 2, 2), (2, 1, 1, 1), (3, 1, 2, 2),
        (4, 1, 1, 1), (5, 1, 1, 1), (6, 1, 1, 1), (7, 1, 1, 1),
        (8, 1, 1, 1), (9, 1, 1, 1), (10, 1, 1, 1), (11, 1, 1, 1),
        (12, 1, 1, 1), (13, 1, 1, 1), (14, 1, 2, 2), (15, 1, 1, 1),
    )
    residual_pooling: bool = True
    dim_mul_in_att: bool = True
    # feature-pyramid tap points (reference backbones/MViT.py:2061-2074)
    out_indices: Tuple[int, int, int, int] = (0, 2, 13, 15)


@dataclass
class SlowFastConfig:
    """SlowFast 4x16 R50 (configs/SLOWFAST_4x16_R50.yaml)."""

    alpha: int = 4
    beta_inv: int = 8
    fusion_conv_channel_ratio: int = 2
    fusion_kernel_sz: int = 5
    depth: int = 50
    width_per_group: int = 64
    num_groups: int = 1
    num_block_temp_kernel: Tuple[Tuple[int, int], ...] = ((3, 3), (4, 4), (6, 6), (3, 3))
    spatial_strides: Tuple[Tuple[int, int], ...] = ((1, 1), (2, 2), (2, 2), (2, 2))


@dataclass
class X3DConfig:
    """X3D-L (configs/X3D_L.yaml)."""

    width_factor: float = 2.0
    depth_factor: float = 5.0
    bottleneck_factor: float = 2.25
    dim_c1: int = 12
    dim_c5: int = 2048


@dataclass
class MorphMLPConfig:
    """MorphMLP-S 16x4 (configs/K400_MLP_S16x4.yaml)."""

    layers: Tuple[int, int, int, int] = (3, 4, 9, 3)
    segment_dim: Tuple[int, int, int, int] = (14, 28, 28, 49)
    mlp_ratios: Tuple[int, int, int, int] = (3, 3, 3, 3)
    embed_dims: Tuple[int, int, int, int] = (112, 224, 392, 784)
    t_stride: int = 4
    qkv_bias: bool = True


@dataclass
class UniFormerConfig:
    """UniFormer-B 16x4 (configs/uniformer_b16x4_k400.yaml)."""

    embed_dim: Tuple[int, int, int, int] = (64, 128, 320, 512)
    depth: Tuple[int, int, int, int] = (5, 8, 20, 7)
    head_dim: int = 64
    mlp_ratio: float = 4.0
    split: bool = False


@dataclass
class VideoSwinConfig:
    """VideoSwin-S (swin_small_patch244_window877_kinetics400_1k)."""

    patch_size: Tuple[int, int, int] = (2, 4, 4)
    embed_dim: int = 96
    depths: Tuple[int, int, int, int] = (2, 2, 18, 2)
    num_heads: Tuple[int, int, int, int] = (3, 6, 12, 24)
    window_size: Tuple[int, int, int] = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    patch_norm: bool = True


@dataclass
class ModelConfig:
    motion_encoder: str = "mvitv2s"
    de_embed_dim: int = 192
    aud_embed_dim: int = 512
    sync_num_blocks: int = 3
    sync_num_heads: int = 4
    simsiam_hidden: int = 2048
    # Pretrained torch checkpoints (converted on the fly when present).
    motion_encoder_weight: str = ""
    audio_encoder_weight: str = ""
    image_saliency_encoder_weight: str = ""
    # Compute dtype for the backbone hot path ("float32" or "bfloat16").
    compute_dtype: str = "float32"
    # Rematerialise transformer blocks in backward (activation memory for
    # ~1 extra forward per block; lets VideoSwin/MViT train at batch 4).
    remat: bool = False
    s3d: S3DConfig = field(default_factory=S3DConfig)
    mvit: MViTConfig = field(default_factory=MViTConfig)
    slowfast: SlowFastConfig = field(default_factory=SlowFastConfig)
    x3d: X3DConfig = field(default_factory=X3DConfig)
    morph: MorphMLPConfig = field(default_factory=MorphMLPConfig)
    uniformer: UniFormerConfig = field(default_factory=UniFormerConfig)
    videoswin: VideoSwinConfig = field(default_factory=VideoSwinConfig)

    @property
    def embed_dims(self) -> Tuple[int, int, int, int]:
        return MOTION_ENCODER_EMBEDS[self.motion_encoder]

    @property
    def lateral_bool(self) -> Tuple[bool, bool, bool, bool]:
        return LATERAL_BOOL[self.motion_encoder]

    @property
    def lateral_stride(self) -> Tuple[int, int, int, int]:
        return (4, 4, 4, 4) if self.motion_encoder == "x3dl" else (2, 2, 2, 2)

    @property
    def pyramid_tdims(self) -> Tuple[int, int, int, int]:
        return MOTION_ENCODER_TDIMS[self.motion_encoder]


@dataclass
class ParallelConfig:
    """Mesh axes for pjit. data=DP batch sharding, model=TP (attention heads
    / MLP features in the fusion transformer)."""

    data_axis: str = "data"
    model_axis: str = "model"
    mesh_shape: Optional[Tuple[int, int]] = None  # (data, model); None = all data


@dataclass
class MSPIConfig:
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    log_dir: str = "./training_logs"

    def num_vis_tokens(self) -> int:
        """Tokens entering SyncBlock: T4 * H/32 * W/32 at the configured
        resolution.  (The reference hard-codes a 224x224 table at
        config.py:48-56 that is stale for the default 224x384 resolution;
        we compute it from the actual shapes.)"""
        h, w = self.data.resolution
        t4 = self.model.pyramid_tdims[3]
        if self.model.motion_encoder == "s3d":
            t4 = 4  # S3D halves T twice (stride-2 stem conv_t + stage-3 pool)
        if self.model.motion_encoder == "slowfast4x16":
            t4 = 4
        # the per-backbone T tables assume the reference's 16-frame clips;
        # scale for non-default num_frames (tiny dryrun shapes)
        t4 = max(1, t4 * self.data.num_frames // 16)
        return t4 * (h // 32) * (w // 32)


def _merge_into_dataclass(obj: Any, overrides: Dict[str, Any]) -> Any:
    """Recursively overlay a dict onto a dataclass tree (case-insensitive
    keys so reference-style YAML ALL_CAPS sections also work)."""
    if not dataclasses.is_dataclass(obj):
        return overrides
    fields = {f.name: f for f in dataclasses.fields(obj)}
    lower = {k.lower(): k for k in fields}
    updates = {}
    for key, value in overrides.items():
        name = lower.get(key.lower())
        if name is None:
            continue  # unknown keys are ignored (reference merge_from_file errors; we tolerate)
        current = getattr(obj, name)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            updates[name] = _merge_into_dataclass(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, list):
                value = tuple(tuple(v) if isinstance(v, list) else v for v in value)
            updates[name] = value
    return dataclasses.replace(obj, **updates)


def get_config(
    motion_encoder: str = "mvitv2s",
    overrides: Optional[Dict[str, Any]] = None,
    yaml_path: Optional[str] = None,
) -> MSPIConfig:
    """Build the full config for a given motion encoder, optionally overlaying
    a YAML file and/or a dict of overrides."""
    if motion_encoder not in MOTION_ENCODERS:
        raise ValueError(f"unknown motion encoder {motion_encoder!r}; options: {MOTION_ENCODERS}")
    cfg = MSPIConfig()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, motion_encoder=motion_encoder))
    if yaml_path is not None:
        import yaml

        with open(yaml_path) as f:
            cfg = _merge_into_dataclass(cfg, yaml.safe_load(f) or {})
    if overrides:
        cfg = _merge_into_dataclass(cfg, overrides)
    return cfg
