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


def hog_per_frame(frames: jnp.ndarray, nbins: int = 9,
                  cell: int = 8) -> jnp.ndarray:
    """HOG descriptor per frame, exact numerics of the reference torch
    HOGLayerC (SlowFast/operators.py:66-122): reflect-pad Sobel gradients,
    atan2(gx, gy)/pi*nbins orientation binning with magnitude votes,
    cell-wise sum pooling, per-cell L2 normalisation over bins.

    [B, H, W, 3] -> [B, H/cell, W/cell, 3, nbins] (channels-last)."""
    B, H, W, C = frames.shape
    x = jnp.pad(frames, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    # Sobel as cross-correlation (torch F.conv2d), depthwise over RGB.
    wx = jnp.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], jnp.float32)
    wy = wx.T
    kern = jnp.stack([wx, wy], axis=-1)  # [3,3,2]
    # depthwise HWIO: [3,3,1,2C], out channel 2c+i = (gx,gy)[i] of channel c
    kern = jnp.tile(kern[:, :, None, :], (1, 1, 1, C))
    g = jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)  # [B,H,W,2C] (per channel: gx, gy)
    g = g.reshape(B, H, W, C, 2)
    gx, gy = g[..., 0], g[..., 1]
    norm = jnp.sqrt(gx * gx + gy * gy)
    phase = jnp.arctan2(gx, gy) / jnp.pi * nbins  # [-nbins, nbins]
    bins = jnp.mod(jnp.floor(phase).astype(jnp.int32), nbins)
    votes = jax.nn.one_hot(bins, nbins, dtype=norm.dtype) * norm[..., None]
    # cell pooling: [B, h, cell, w, cell, C, nbins] -> sum over the cell
    votes = votes.reshape(B, H // cell, cell, W // cell, cell, C, nbins)
    hist = votes.sum(axis=(2, 4))
    denom = jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), 1e-12)
    return hist / denom  # torch F.normalize(p=2) semantics


def hog_targets(clips: jnp.ndarray, temporal_stride: int = 2,
                spatial_stride: int = 16, nbins: int = 9,
                cell: int = 8) -> jnp.ndarray:
    """Per-token HOG labels at the (temporal_stride, spatial_stride) token
    grid — the reference's _get_hog_label_3d (masked.py:267-291): per-frame
    HOG at the patch temporal sampling, then the u*u cells under each token
    concatenated channel-major (index = (c*nbins+bin)*u*u + i*u + j).

    [B,T,H,W,3] -> [B, T/ts, H/ss, W/ss, 3*nbins*(ss/cell)**2]."""
    B, T, H, W, C = clips.shape
    frames = clips[:, ::temporal_stride].reshape(-1, H, W, C)
    hog = hog_per_frame(frames, nbins=nbins, cell=cell)
    u = spatial_stride // cell
    fh, fw = H // spatial_stride, W // spatial_stride
    hog = hog.reshape(B, T // temporal_stride, fh, u, fw, u, C * nbins)
    hog = hog.transpose(0, 1, 2, 4, 6, 3, 5)  # [B,t,fh,fw,27,u,u]
    return hog.reshape(B, T // temporal_stride, fh, fw, C * nbins * u * u)


class MaskedMViT(nn.Module):
    """Masked-prediction wrapper: returns (prediction, target, mask)."""

    cfg: MViTConfig
    patch_stride: Tuple[int, int, int] = (2, 4, 4)
    mask_ratio: float = 0.4
    # target="hog" predicts 3*nbins*(hog_stride/hog_cell)^2 HOG features per
    # (pt, hog_stride, hog_stride) token (MASK.PRED_HOG, masked.py:52-73);
    # mask must then be at the (T/pt, H/hog_stride, W/hog_stride) grid.
    target: str = "pixel"
    hog_stride: int = 16
    hog_cell: int = 8
    nbins: int = 9

    def setup(self):
        self.backbone = MViTFeatures(cfg=self.cfg)
        self.mask_token = self.param("mask_token", trunc_normal_init(0.02), (1, 1, 1, 1, 3))
        pt, ph, pw = self.patch_stride
        self.pred_norm = layernorm()
        if self.target == "hog":
            u = self.hog_stride // self.hog_cell
            self.decoder_pred = dense(768, 3 * self.nbins * u * u)
        else:
            self.decoder_pred = dense(768, pt * ph * pw * 3)

    def __call__(self, clips: jnp.ndarray, mask: jnp.ndarray, train: bool = False):
        B, T, H, W, C = clips.shape
        pt, ph, pw = self.patch_stride
        if self.target == "hog":
            grid = (T // pt, H // self.hog_stride, W // self.hog_stride)
            reps = (pt, self.hog_stride, self.hog_stride)
        else:
            grid = (T // pt, H // ph, W // pw)
            reps = (pt, ph, pw)
        # replace masked patches with the mask token in input space
        up_mask = jnp.repeat(jnp.repeat(jnp.repeat(mask, reps[0], 1),
                                        reps[1], 2), reps[2], 3)
        masked_clips = jnp.where(up_mask[..., None],
                                 self.mask_token.astype(clips.dtype), clips)

        feats = self.backbone(masked_clips, train=train)
        x = feats[-1]  # [B, T/2, H/32, W/32, 768]
        # upsample features back to the token grid and predict the target
        x = resize_to(x, grid, (1, 2, 3))
        pred = self.decoder_pred(self.pred_norm(x))

        if self.target == "hog":
            target = hog_targets(clips, pt, self.hog_stride,
                                 nbins=self.nbins, cell=self.hog_cell)
        else:
            target = clips.reshape(B, grid[0], pt, grid[1], ph, grid[2], pw, C)
            target = target.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                B, *grid, pt * ph * pw * C)
        return pred, target, mask


def masked_prediction_loss(pred, target, mask, normalize_target: bool = True):
    """MSE on masked patches only.  Pixel targets are per-patch normalised
    (MASK.NORM_PRED_PIXEL); HOG targets are already cell-normalised and use
    plain MSE (reference hog_loss="mse") -> normalize_target=False."""
    if normalize_target:
        mu = target.mean(axis=-1, keepdims=True)
        sd = target.std(axis=-1, keepdims=True) + 1e-6
        target = (target - mu) / sd
    err = jnp.mean((pred - target) ** 2, axis=-1)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)
