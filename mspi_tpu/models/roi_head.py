"""Detection (AVA-style) head: ROI-align over video features + classifier.

Reference: SlowFast/slowfast/models/head_helper.py ResNetRoIHead — temporal
average of the feature map, per-box ROIAlign, spatial max-pool, linear
classifier with sigmoid (multi-label AVA actions).

ROI align is implemented with bilinear sampling at half-pixel bin centres
(jittable, vmapped over boxes).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import dense


def roi_align(features: jnp.ndarray, boxes: jnp.ndarray, output_size: int,
              spatial_scale: float = 1.0, sampling_ratio: int = 2) -> jnp.ndarray:
    """features: [H, W, C]; boxes: [N, 4] (x0, y0, x1, y1) in input coords.
    Returns [N, output_size, output_size, C]."""
    H, W, C = features.shape

    def sample(y, x):
        y = jnp.clip(y, 0.0, H - 1.0)
        x = jnp.clip(x, 0.0, W - 1.0)
        y0 = jnp.floor(y).astype(jnp.int32)
        x0 = jnp.floor(x).astype(jnp.int32)
        y1 = jnp.minimum(y0 + 1, H - 1)
        x1 = jnp.minimum(x0 + 1, W - 1)
        wy = y - y0
        wx = x - x0
        v00 = features[y0, x0]
        v01 = features[y0, x1]
        v10 = features[y1, x0]
        v11 = features[y1, x1]
        return ((1 - wy) * (1 - wx))[..., None] * v00 + ((1 - wy) * wx)[..., None] * v01 \
            + (wy * (1 - wx))[..., None] * v10 + (wy * wx)[..., None] * v11

    def one_box(box):
        x0, y0, x1, y1 = box * spatial_scale
        bw = jnp.maximum(x1 - x0, 1e-3) / output_size
        bh = jnp.maximum(y1 - y0, 1e-3) / output_size
        s = sampling_ratio
        iy = (jnp.arange(output_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
        ix = (jnp.arange(output_size)[:, None] + (jnp.arange(s)[None, :] + 0.5) / s)
        ys = y0 + (iy * bh).reshape(-1)       # [out*s]
        xs = x0 + (ix * bw).reshape(-1)
        grid_y = jnp.repeat(ys, output_size * s)
        grid_x = jnp.tile(xs, output_size * s)
        vals = sample(grid_y, grid_x).reshape(output_size, s, output_size, s, C)
        return vals.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes)


class ResNetRoIHead(nn.Module):
    """Temporal-mean feature -> ROIAlign -> spatial max -> dropout -> linear
    -> sigmoid (head_helper.py ResNetRoIHead, single pathway)."""

    dim_in: int
    num_classes: int
    pool_size: int = 7
    spatial_scale: float = 1.0 / 16
    dropout_rate: float = 0.5

    def setup(self):
        self.projection = dense(self.dim_in, self.num_classes)

    def __call__(self, features: jnp.ndarray, boxes: jnp.ndarray,
                 box_batch_idx: jnp.ndarray, train: bool = False,
                 rng=None) -> jnp.ndarray:
        """features: [B,T,H,W,C]; boxes: [N,4] input-resolution xyxy;
        box_batch_idx: [N] which batch element each box crops."""
        fmap = features.mean(axis=1)  # temporal average [B,H,W,C]
        per_box_maps = fmap[box_batch_idx]  # [N,H,W,C]
        aligned = jax.vmap(
            lambda f, b: roi_align(f, b[None], self.pool_size,
                                   self.spatial_scale)[0]
        )(per_box_maps, boxes)  # [N,ps,ps,C]
        x = aligned.max(axis=(1, 2))
        if self.dropout_rate > 0 and train and rng is not None:
            keep = 1.0 - self.dropout_rate
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        return jax.nn.sigmoid(self.projection(x))
