"""Frame / ground-truth / fixation loading.

Reference: /root/reference/avsp_dataloader.py:83-193 —
frames: JPEG -> PIL RGB -> Resize (224,384) bilinear+antialias -> /255 ->
ImageNet mean/std normalise; GT eyeMap JPEG -> grayscale -> cv2 bilinear
resize -> /255; fixations: fixMap .mat -> coordinate remap to (224,384)
(resize_fixation, avsp_dataloader.py:16-31).

The host side only decodes + resizes uint8; normalisation can run fused
on-device (`normalize_clip_jax`) so the TPU path starts at HBM with raw
bytes-sized tensors.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def load_frame(path: str, size: Tuple[int, int]) -> np.ndarray:
    """JPEG -> [H, W, 3] uint8 resized to `size` (h, w) with PIL bilinear
    (antialiased, matching torchvision Resize).

    Set MSPI_NATIVE_LOADER=1 to decode+resize through the C++ library
    (native/mspi_loader.cc) instead — same antialiased filter, libjpeg
    decode, no Python per-pixel work.
    """
    import os

    if os.environ.get("MSPI_NATIVE_LOADER"):
        from mspi_tpu.data.native import load_frame_native

        out = load_frame_native(path, size)
        if out is not None:
            return out
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize((size[1], size[0]), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


def normalize_frames(frames: np.ndarray) -> np.ndarray:
    """[..., H, W, 3] uint8 -> float32 ImageNet-normalised (host path)."""
    x = frames.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def normalize_clip_jax(frames: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Fused on-device normalisation: uint8 [B,T,H,W,3] -> float.

    The arithmetic is fp32 (exact host parity: normalize_frames above); pass
    ``dtype=jnp.bfloat16`` to emit the model's compute dtype directly so XLA
    writes one bf16 tensor instead of materialising an fp32 copy that the
    first conv immediately re-casts (the profiled host-input convert copy).
    """
    x = frames.astype(jnp.float32) / 255.0
    x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return x if dtype is None else x.astype(dtype)


def load_gt_map(path: str, size: Tuple[int, int]) -> np.ndarray:
    """eyeMap JPEG -> grayscale float [h, w] in [0,1] (cv2 bilinear resize,
    /255 when >1 — avsp_dataloader.py:170-181)."""
    import cv2
    from PIL import Image

    gt = np.array(Image.open(path).convert("L")).astype(np.float64)
    gt = cv2.resize(gt, (size[1], size[0]))
    if gt.max() > 1.0:
        gt = gt / 255.0
    return gt.astype(np.float32)


def resize_fixation(image: np.ndarray, row: int, col: int) -> np.ndarray:
    """Coordinate-remap binary fixation map (avsp_dataloader.py:16-31)."""
    resized = np.zeros((row, col), dtype=np.float32)
    ratio_row = row / image.shape[0]
    ratio_col = col / image.shape[1]
    coords = np.argwhere(image)
    if len(coords):
        rr = np.minimum(np.round(coords[:, 0] * ratio_row).astype(int), row - 1)
        cc = np.minimum(np.round(coords[:, 1] * ratio_col).astype(int), col - 1)
        resized[rr, cc] = 1.0
    return resized


def load_fixation(path: str, row: int = 224, col: int = 384) -> np.ndarray:
    """fixMap_%05d.mat ['eyeMap'] -> remapped binary map."""
    import scipy.io

    fix = np.array(scipy.io.loadmat(path)["eyeMap"])
    return resize_fixation(fix, row=row, col=col)
