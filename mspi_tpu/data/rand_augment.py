"""RandAugment + color jitter for video clips, as jittable jnp transforms.

Reference: SlowFast/slowfast/datasets/rand_augment.py (timm-derived op set
with magnitude scheduling, used via AUG.AA_TYPE "rand-m7-n4-mstd0.5") and
cv2_transform.py color_jitter/lighting_list.

TPU-native: ops are pure jnp on [T, H, W, 3] float clips in [0, 1] and are
vmapped over the batch — augmentation runs fused on device after the host
decode, instead of per-frame PIL calls on loader workers.  Geometric ops
(rotate/shear/translate) use bilinear resampling with border fill, matching
PIL's affine with fillcolor=128/255.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_FILL = 0.5  # PIL fillcolor (128,128,128)/255


# ------------------------------------------------------------- geometric ops

def _affine_sample(clip: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """Apply inverse affine [2,3] to every frame with bilinear sampling."""
    T, H, W, C = clip.shape
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    # centre, transform, un-centre (PIL rotates about the centre)
    sx = mat[0, 0] * (xs - cx) + mat[0, 1] * (ys - cy) + mat[0, 2] + cx
    sy = mat[1, 0] * (xs - cx) + mat[1, 1] * (ys - cy) + mat[1, 2] + cy
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yi, xi):
        inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = clip[:, yc, xc]  # [T, H, W, C]
        return jnp.where(inside[None, :, :, None], vals, _FILL)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    w00 = ((1 - wy) * (1 - wx))[None, :, :, None]
    w01 = ((1 - wy) * wx)[None, :, :, None]
    w10 = (wy * (1 - wx))[None, :, :, None]
    w11 = (wy * wx)[None, :, :, None]
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


def rotate(clip, degrees):
    rad = -degrees * jnp.pi / 180.0  # inverse map
    c, s = jnp.cos(rad), jnp.sin(rad)
    mat = jnp.array([[1, 0, 0], [0, 1, 0]], jnp.float32)
    mat = mat.at[0, 0].set(c).at[0, 1].set(-s).at[1, 0].set(s).at[1, 1].set(c)
    return _affine_sample(clip, mat)


def shear_x(clip, factor):
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return _affine_sample(clip, mat.at[0, 1].set(factor))


def shear_y(clip, factor):
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return _affine_sample(clip, mat.at[1, 0].set(factor))


def translate_x(clip, frac):
    W = clip.shape[2]
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return _affine_sample(clip, mat.at[0, 2].set(frac * W))


def translate_y(clip, frac):
    H = clip.shape[1]
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    return _affine_sample(clip, mat.at[1, 2].set(frac * H))


# ----------------------------------------------------------------- pixel ops

def _blend(a, b, factor):
    return jnp.clip(b + factor * (a - b), 0.0, 1.0)


def _grayscale(clip):
    w = jnp.array([0.299, 0.587, 0.114], clip.dtype)
    return jnp.sum(clip * w, axis=-1, keepdims=True)


def brightness(clip, factor):
    return _blend(clip, jnp.zeros_like(clip), factor)


def contrast(clip, factor):
    mean = jnp.mean(_grayscale(clip), axis=(1, 2, 3), keepdims=True)
    return _blend(clip, jnp.broadcast_to(mean, clip.shape), factor)


def saturation(clip, factor):  # "color" op in timm
    return _blend(clip, jnp.broadcast_to(_grayscale(clip), clip.shape), factor)


def posterize(clip, bits):
    levels = 2.0 ** bits
    q = jnp.floor(clip * 255.0 / 256.0 * levels) / levels * 256.0 / 255.0
    return jnp.clip(q, 0.0, 1.0)


def solarize(clip, thresh):
    return jnp.where(clip >= thresh, 1.0 - clip, clip)


def solarize_add(clip, add, thresh: float = 128.0 / 255.0):
    return jnp.where(clip < thresh, jnp.clip(clip + add, 0.0, 1.0), clip)


def invert(clip, _=None):
    return 1.0 - clip


def autocontrast(clip, _=None):
    lo = clip.min(axis=(0, 1, 2), keepdims=True)
    hi = clip.max(axis=(0, 1, 2), keepdims=True)
    scale = jnp.where(hi > lo, 1.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    return jnp.clip((clip - lo) * scale, 0.0, 1.0)


def equalize(clip, _=None):
    """Per-channel histogram equalization over the whole clip (256 bins)."""
    def eq_channel(ch):
        vals = jnp.clip((ch * 255.0), 0, 255).astype(jnp.int32)
        hist = jnp.zeros((256,), jnp.float32).at[vals.ravel()].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf_min = cdf[jnp.argmax(hist > 0)]
        denom = jnp.maximum(cdf[-1] - cdf_min, 1.0)
        lut = jnp.clip((cdf - cdf_min) / denom, 0.0, 1.0)
        return lut[vals]

    return jnp.stack([eq_channel(clip[..., c]) for c in range(clip.shape[-1])],
                     axis=-1)


def sharpness(clip, factor):
    k = jnp.array([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    T, H, W, C = clip.shape
    x = clip.transpose(0, 3, 1, 2).reshape(T * C, 1, H, W)
    blurred = jax.lax.conv_general_dilated(
        x, k[None, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    blurred = blurred.reshape(T, C, H, W).transpose(0, 2, 3, 1)
    return _blend(clip, blurred, 1.0 - (1.0 - factor))  # factor blends toward sharp


# -------------------------------------------------------------- rand augment

# (fn, magnitude -> arg) following rand_augment.py's _LEVEL_TO_ARG at M in
# [0, 10]; signed ops flip direction with probability 0.5.
def _ops(mstd_key, m):
    neg = lambda key, v: jnp.where(jax.random.bernoulli(key), v, -v)
    k = jax.random.split(mstd_key, 8)
    return [
        ("rotate", rotate, neg(k[0], m / 10.0 * 30.0)),
        ("shear_x", shear_x, neg(k[1], m / 10.0 * 0.3)),
        ("shear_y", shear_y, neg(k[2], m / 10.0 * 0.3)),
        ("translate_x", translate_x, neg(k[3], m / 10.0 * 0.45)),
        ("translate_y", translate_y, neg(k[4], m / 10.0 * 0.45)),
        ("brightness", brightness, 1.0 + neg(k[5], m / 10.0 * 0.9)),
        ("contrast", contrast, 1.0 + neg(k[6], m / 10.0 * 0.9)),
        ("saturation", saturation, 1.0 + neg(k[7], m / 10.0 * 0.9)),
        ("sharpness", sharpness, 1.0 + neg(k[7], m / 10.0 * 0.9)),
        ("posterize", posterize, 8.0 - m / 10.0 * 4.0),
        ("solarize", solarize, 1.0 - m / 10.0),
        ("autocontrast", autocontrast, 0.0),
        ("equalize", equalize, 0.0),
        ("invert", invert, 0.0),
    ]


@partial(jax.jit, static_argnames=("num_layers", "magnitude", "mag_std"))
def rand_augment_clip(rng: jax.Array, clip: jnp.ndarray, num_layers: int = 2,
                      magnitude: int = 9, mag_std: float = 0.5) -> jnp.ndarray:
    """rand-m{magnitude}-n{num_layers}-mstd{mag_std} on one [T,H,W,3] clip
    in [0,1].  Op choice is uniform like the reference; every op is traced
    once and selected with lax.switch (static shapes, no recompiles)."""
    k_m, k_sel, k_sign = jax.random.split(rng, 3)
    m = magnitude + mag_std * jax.random.normal(k_m)
    m = jnp.clip(m, 0.0, 10.0)
    ops = _ops(k_sign, m)

    def apply_one(carry, key):
        idx = jax.random.randint(key, (), 0, len(ops))
        branches = [partial(lambda fn, arg, c: fn(c, arg), fn, arg)
                    for _, fn, arg in ops]
        return jax.lax.switch(idx, branches, carry), None

    out, _ = jax.lax.scan(apply_one, clip,
                          jax.random.split(k_sel, num_layers))
    return out


def rand_augment_batch(rng: jax.Array, clips: jnp.ndarray, num_layers: int = 2,
                       magnitude: int = 9, mag_std: float = 0.5) -> jnp.ndarray:
    keys = jax.random.split(rng, clips.shape[0])
    return jax.vmap(lambda k, c: rand_augment_clip(
        k, c, num_layers=num_layers, magnitude=magnitude,
        mag_std=mag_std))(keys, clips)


def color_jitter_batch(rng: jax.Array, clips: jnp.ndarray,
                       img_brightness: float = 0.4, img_contrast: float = 0.4,
                       img_saturation: float = 0.4) -> jnp.ndarray:
    """cv2_transform.py color_jitter_list: apply the three jitters in random
    order with uniform factors in [1-x, 1+x]."""
    B = clips.shape[0]

    def one(key, clip):
        ks = jax.random.split(key, 4)
        fb = jax.random.uniform(ks[0], (), minval=1 - img_brightness,
                                maxval=1 + img_brightness)
        fc = jax.random.uniform(ks[1], (), minval=1 - img_contrast,
                                maxval=1 + img_contrast)
        fs = jax.random.uniform(ks[2], (), minval=1 - img_saturation,
                                maxval=1 + img_saturation)
        order = jax.random.permutation(ks[3], 3)

        def body(c, i):
            c = jax.lax.switch(i, [
                lambda c: brightness(c, fb),
                lambda c: contrast(c, fc),
                lambda c: saturation(c, fs),
            ], c)
            return c, None

        out, _ = jax.lax.scan(body, clip, order)
        return out

    return jax.vmap(one)(jax.random.split(rng, B), clips)


def lighting_batch(rng: jax.Array, clips: jnp.ndarray, eigval, eigvec,
                   alphastd: float = 0.1) -> jnp.ndarray:
    """cv2_transform.py lighting_list: PCA lighting noise per clip."""
    B = clips.shape[0]
    alpha = alphastd * jax.random.normal(rng, (B, 3))
    eigval = jnp.asarray(eigval, jnp.float32)
    eigvec = jnp.asarray(eigvec, jnp.float32)
    delta = (eigvec[None] * (alpha * eigval[None])[:, None, :]).sum(-1)  # [B,3]
    return jnp.clip(clips + delta[:, None, None, None, :], 0.0, 1.0)
