"""Weight inflation / interpolation utilities.

Reference: 2D->3D conv inflation (uniformer.py:421-431 inflate_weight,
video_swin_transformer.py:608-657 inflate_weights, SlowFast
checkpoint.py:152-190) and positional-embedding interpolation for
resolution transfer (utils/optim.py:64-80 interpolate_embeddings,
MViT.py:207-220 get_rel_pos).

All functions operate on converted (flax-layout) arrays: conv kernels
[*spatial, in, out], pos embeds [1, N, C].
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def inflate_conv2d_to_3d(kernel_2d: np.ndarray, time_dim: int,
                         center: bool = False) -> np.ndarray:
    """[kh, kw, I, O] -> [kt, kh, kw, I, O].

    center=False: repeat / kt (I3D-style mean-preserving inflation, the
    uniformer default); center=True: place the 2D kernel at the middle
    temporal tap with zeros elsewhere."""
    kh, kw, i, o = kernel_2d.shape
    if center:
        out = np.zeros((time_dim, kh, kw, i, o), kernel_2d.dtype)
        out[time_dim // 2] = kernel_2d
        return out
    return np.broadcast_to(kernel_2d, (time_dim, kh, kw, i, o)).copy() / time_dim


def interpolate_pos_embed(pos_embed: np.ndarray, new_len: int,
                          num_prefix_tokens: int = 1) -> np.ndarray:
    """[1, P + prefix, C] -> [1, new_len + prefix, C] by bicubic-free
    bilinear resize over the sqrt grid (utils/optim.py:64-80 semantics)."""
    import jax

    prefix = pos_embed[:, :num_prefix_tokens]
    grid = pos_embed[:, num_prefix_tokens:]
    p = grid.shape[1]
    old_side = int(math.sqrt(p))
    new_side = int(math.sqrt(new_len))
    assert old_side * old_side == p and new_side * new_side == new_len
    grid = grid.reshape(1, old_side, old_side, -1)
    grid = np.asarray(jax.image.resize(grid, (1, new_side, new_side, grid.shape[-1]),
                                       method="linear", antialias=False))
    grid = grid.reshape(1, new_len, -1)
    return np.concatenate([prefix, grid], axis=1)


def interpolate_rel_pos(rel_pos: np.ndarray, new_len: int) -> np.ndarray:
    """[L, C] -> [new_len, C] linear interpolation (MViT get_rel_pos)."""
    import jax

    if rel_pos.shape[0] == new_len:
        return rel_pos
    return np.asarray(jax.image.resize(rel_pos, (new_len, rel_pos.shape[1]),
                                       method="linear", antialias=False))


def inflate_swin2d(state_flax: dict, patch_t: int, window_t: int) -> dict:
    """Swin-2D -> VideoSwin inflation on a converted tree: patch-embed conv
    repeated over time / patch_t; relative bias tables tiled over (2*wd-1)
    (video_swin_transformer.py:608-657)."""
    out = dict(state_flax)

    def visit(tree, path=()):
        for k, v in list(tree.items()):
            if isinstance(v, dict):
                visit(v, path + (k,))
            elif k == "kernel" and path and path[-1] == "proj" and np.ndim(v) == 4:
                tree[k] = inflate_conv2d_to_3d(v, patch_t)
            elif k == "relative_position_bias_table":
                tree[k] = np.tile(v, (2 * window_t - 1, 1))

    visit(out)
    return out
