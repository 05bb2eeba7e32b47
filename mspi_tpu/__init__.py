"""MSPI-TPU: a TPU-native audio-visual saliency prediction framework.

A ground-up JAX/XLA/Pallas re-design of the capability surface of
oraclefina/MSPI ("Audio-Visual Saliency Prediction with Multisensory
Perception and Integration", Image & Vision Computing 2024):

- 7 Kinetics-400 video backbones (SlowFast, X3D-L, MViTv2-S, UniFormer-B,
  VideoSwin-S, MorphMLP-S, S3D) emitting 4-level feature pyramids,
- a ResNet18-VGGSound audio encoder,
- a ConvNeXt-Tiny image-saliency prior,
- cross-modal transformer fusion (SyncBlock) + FPN decoder + readout,
- saliency losses/metrics (KLD/CC/SIM/NSS/AUC),
- a fused jittable input pipeline, a jitted data-parallel training engine,
  and a torch-checkpoint weight converter.

Everything on the compute path is jittable, channels-last, static-shape and
designed for the MXU; distribution is expressed with jax.sharding over a
device Mesh (DP batch sharding + optional TP over attention heads), not with
process-group plumbing.
"""

__version__ = "0.1.0"

from mspi_tpu.config import MSPIConfig, get_config  # noqa: F401
