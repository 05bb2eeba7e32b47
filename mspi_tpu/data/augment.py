"""Training augmentations for the classification surface.

Reference: SlowFast/slowfast/datasets/mixup.py (MixUp/CutMix with label
smoothing), random_erasing.py (RE_PROB/RE_MODE pixel), and the color-jitter
path of datasets/utils.py.  Implemented as jittable jnp transforms operating
on batches — they run fused on device instead of per-sample on the CPU
loader like the torch versions.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def one_hot_smooth(labels: jnp.ndarray, num_classes: int, smoothing: float = 0.0,
                   lam: float = 1.0, labels2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    off = smoothing / num_classes
    on = 1.0 - smoothing + off
    y1 = jax.nn.one_hot(labels, num_classes) * (on - off) + off
    if labels2 is None:
        return y1
    y2 = jax.nn.one_hot(labels2, num_classes) * (on - off) + off
    return lam * y1 + (1.0 - lam) * y2


def mixup_batch(rng: jax.Array, clips: jnp.ndarray, labels: jnp.ndarray,
                num_classes: int, alpha: float = 0.8,
                smoothing: float = 0.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MixUp: blend with the reversed batch, beta(alpha, alpha) weight."""
    lam = jax.random.beta(rng, alpha, alpha)
    mixed = lam * clips + (1.0 - lam) * clips[::-1]
    targets = one_hot_smooth(labels, num_classes, smoothing, lam, labels[::-1])
    return mixed, targets


def cutmix_batch(rng: jax.Array, clips: jnp.ndarray, labels: jnp.ndarray,
                 num_classes: int, alpha: float = 1.0,
                 smoothing: float = 0.1) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CutMix: paste a random spatial box from the reversed batch; lambda is
    corrected to the actual box area like the reference."""
    k1, k2, k3 = jax.random.split(rng, 3)
    lam = jax.random.beta(k1, alpha, alpha)
    B, T, H, W, C = clips.shape
    cut_ratio = jnp.sqrt(1.0 - lam)
    cut_h = (H * cut_ratio).astype(jnp.int32)
    cut_w = (W * cut_ratio).astype(jnp.int32)
    cy = jax.random.randint(k2, (), 0, H)
    cx = jax.random.randint(k3, (), 0, W)
    y0 = jnp.clip(cy - cut_h // 2, 0, H)
    y1 = jnp.clip(cy + cut_h // 2, 0, H)
    x0 = jnp.clip(cx - cut_w // 2, 0, W)
    x1 = jnp.clip(cx + cut_w // 2, 0, W)
    rows = jnp.arange(H)[:, None]
    cols = jnp.arange(W)[None, :]
    box = ((rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1))[None, None, :, :, None]
    mixed = jnp.where(box, clips[::-1], clips)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)) / (H * W)
    targets = one_hot_smooth(labels, num_classes, smoothing, lam_adj, labels[::-1])
    return mixed, targets


def random_erasing(rng: jax.Array, clips: jnp.ndarray, prob: float = 0.25,
                   min_area: float = 0.02, max_area: float = 1 / 3,
                   min_aspect: float = 0.3) -> jnp.ndarray:
    """Per-sample random erasing with 'pixel' mode (gaussian noise fill)."""
    B, T, H, W, C = clips.shape

    def erase_one(rng, clip):
        k_apply, k_area, k_aspect, k_y, k_x, k_noise = jax.random.split(rng, 6)
        area = H * W * jax.random.uniform(k_area, (), minval=min_area, maxval=max_area)
        log_ratio = jax.random.uniform(k_aspect, (), minval=jnp.log(min_aspect),
                                       maxval=jnp.log(1 / min_aspect))
        ratio = jnp.exp(log_ratio)
        h = jnp.sqrt(area * ratio).astype(jnp.int32).clip(1, H - 1)
        w = jnp.sqrt(area / ratio).astype(jnp.int32).clip(1, W - 1)
        y = jax.random.randint(k_y, (), 0, H - h)
        x = jax.random.randint(k_x, (), 0, W - w)
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]
        box = ((rows >= y) & (rows < y + h) & (cols >= x) & (cols < x + w))[None, :, :, None]
        noise = jax.random.normal(k_noise, clip.shape, clip.dtype)
        erased = jnp.where(box, noise, clip)
        return jnp.where(jax.random.uniform(k_apply) < prob, erased, clip)

    return jax.vmap(erase_one)(jax.random.split(rng, B), clips)
