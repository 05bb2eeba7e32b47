"""Masked video pretraining (MaskFeat-style) on the MViT trunk.

Reference: SlowFast/slowfast/models/masked.py:25-… (MaskMViT): mask a
fraction of space-time patches, replace them with a learnable mask token,
and regress a target feature (pixel values or HOG) at the masked locations.

Functional version: masking is an input-space op (jittable), the predictor
is a linear head over the final trunk features upsampled to the patch grid.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import MViTConfig
from mspi_tpu.models.mvit import MViTFeatures
from mspi_tpu.ops import dense, layernorm, resize_to, trunc_normal_init


def random_patch_mask(rng: jax.Array, batch: int, grid: Tuple[int, int, int],
                      mask_ratio: float = 0.4) -> jnp.ndarray:
    """[B, t, h, w] boolean mask with ~mask_ratio True entries."""
    t, h, w = grid
    n = t * h * w
    scores = jax.random.uniform(rng, (batch, n))
    k = int(n * mask_ratio)
    thresh = jnp.sort(scores, axis=1)[:, k][:, None]
    return (scores < thresh).reshape(batch, t, h, w)


class MaskedMViT(nn.Module):
    """Masked-prediction wrapper: returns (prediction, target, mask)."""

    cfg: MViTConfig
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    mask_ratio: float = 0.4

    def setup(self):
        self.backbone = MViTFeatures(cfg=self.cfg)
        self.mask_token = self.param("mask_token", trunc_normal_init(0.02), (1, 1, 1, 1, 3))
        pt, ph, pw = self.patch_stride
        self.pred_norm = layernorm()
        self.decoder_pred = dense(768, pt * ph * pw * 3)

    def __call__(self, clips: jnp.ndarray, mask: jnp.ndarray, train: bool = False):
        B, T, H, W, C = clips.shape
        pt, ph, pw = self.patch_stride
        grid = (T // pt, H // ph, W // pw)
        # replace masked patches with the mask token in input space
        up_mask = jnp.repeat(jnp.repeat(jnp.repeat(mask, pt, 1), ph, 2), pw, 3)
        masked_clips = jnp.where(up_mask[..., None], self.mask_token, clips)

        feats = self.backbone(masked_clips, train=train)
        x = feats[-1]  # [B, T/2, H/32, W/32, 768]
        # upsample features back to the patch grid and predict raw patches
        x = resize_to(x, grid, (1, 2, 3))
        pred = self.decoder_pred(self.pred_norm(x))  # [B, t, h, w, pt*ph*pw*3]

        target = clips.reshape(B, grid[0], pt, grid[1], ph, grid[2], pw, C)
        target = target.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            B, *grid, pt * ph * pw * C)
        return pred, target, mask


def masked_prediction_loss(pred, target, mask):
    """MSE on masked patches only, per-patch normalised target (MaskFeat)."""
    mu = target.mean(axis=-1, keepdims=True)
    sd = target.std(axis=-1, keepdims=True) + 1e-6
    target = (target - mu) / sd
    err = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
