"""VideoSwin-S backbone: 3-D shifted-window attention.

Reference: /root/reference/backbones/video_swin_transformer.py
(`SwinTransformer3D` defaults as constructed by get_video_backbones.py:24:
patch (2,4,4), embed 96, depths (2,2,18,2), heads (3,6,12,24), window
(8,7,7), qkv_bias True, patch_norm False, drop_path 0).

TPU design notes:
- channels-last end to end; window partition is a reshape+transpose that XLA
  fuses into the attention matmuls,
- the shifted-window attention mask and the relative-position index are
  *static* for a given feature shape, so they are computed in numpy at trace
  time and baked into the program as constants (the reference recomputes the
  mask per forward and lru_caches it, video_swin_transformer.py:333-346),
- each window is 8x7x7=392 tokens with head_dim 32 — batched over
  (B x num_windows) the attention is pure MXU work.

Pyramid taps are the *pre-downsample* features of each stage
(video_swin_transformer.py:408-431): (96,192,384,768) at /4../32, T=8.
"""

from __future__ import annotations

import os
from functools import lru_cache, partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mspi_tpu.config import VideoSwinConfig
from mspi_tpu.ops import (conv3d, dense, gelu, layernorm, stem_conv3d,
                          trunc_normal_init)


class ModuleList(nn.Module):
    """Container mirroring torch nn.ModuleList naming: child i lives at
    '<name>/layers_i', matching torch '<name>.i'."""

    layers: Sequence[nn.Module]

    def __call__(self, *a, **k):  # pragma: no cover - container only
        raise NotImplementedError


@lru_cache(maxsize=64)
def _rel_pos_index(wd: int, wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index into the bias table
    (video_swin_transformer.py:134-149)."""
    coords = np.stack(np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # [3, wd, wh, ww]
    flat = coords.reshape(3, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


def _disp_onehot(w: int) -> np.ndarray:
    """E[t, u, a] = 1 iff t - u + w - 1 == a (axis displacement one-hot)."""
    t = np.arange(w)
    a = t[:, None] - t[None, :] + w - 1  # [w, w]
    E = np.zeros((w, w, 2 * w - 1), np.float32)
    E[t[:, None], t[None, :], a] = 1.0
    return E


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _bias_rows(table, window):
    """table[idx] for the FULL (unclamped) window — the gather whose
    autodiff backward is a serial scatter-add that the r5 videoswins train
    profile measured at ~1.06 ms PER BLOCK (24 blocks ≈ a third of the
    whole backward).  The custom bwd exploits the index's separability
    (idx = a_t*(2wh-1)(2ww-1) + a_h*(2ww-1) + a_w): the scatter is three
    tiny one-hot einsums on the MXU."""
    wd, wh, ww = window
    idx = _rel_pos_index(wd, wh, ww)
    return table[np.asarray(idx).reshape(-1)]  # [N*N, H]


def _bias_rows_fwd(table, window):
    return _bias_rows(table, window), ()


def _bias_rows_bwd(window, _res, g):
    wd, wh, ww = window
    H = g.shape[-1]
    gg = g.astype(jnp.float32).reshape(wd, wh, ww, wd, wh, ww, H)
    Et = jnp.asarray(_disp_onehot(wd))
    Eh = jnp.asarray(_disp_onehot(wh))
    Ew = jnp.asarray(_disp_onehot(ww))
    r = jnp.einsum("tyxuvwh,tua->ayxvwh", gg, Et)
    r = jnp.einsum("ayxvwh,yvb->abxwh", r, Eh)
    r = jnp.einsum("abxwh,xwc->abch", r, Ew)
    return (r.reshape(-1, H).astype(g.dtype),)


_bias_rows.defvjp(_bias_rows_fwd, _bias_rows_bwd)


@lru_cache(maxsize=64)
def _attn_mask(Dp: int, Hp: int, Wp: int, window_size: Tuple[int, int, int],
               shift_size: Tuple[int, int, int]) -> np.ndarray:
    """Shifted-window attention mask (compute_mask,
    video_swin_transformer.py:333-346): [nW, N, N] of {0, -100}."""
    img = np.zeros((Dp, Hp, Wp))
    cnt = 0
    # exact torch slicing incl. the shift==0 case where slice(-0, None)
    # covers the whole axis (so the axis collapses to one region)
    for d in (slice(None, -window_size[0]), slice(-window_size[0], -shift_size[0]),
              slice(-shift_size[0], None)):
        for h in (slice(None, -window_size[1]), slice(-window_size[1], -shift_size[1]),
                  slice(-shift_size[1], None)):
            for w in (slice(None, -window_size[2]), slice(-window_size[2], -shift_size[2]),
                      slice(-shift_size[2], None)):
                img[d, h, w] = cnt
                cnt += 1
    win = _window_partition_np(img[None, ..., None], window_size)[..., 0]  # [nW, N]
    mask = win[:, None, :] - win[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


def _window_partition_np(x, window_size):
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww, C)


def window_partition(x: jnp.ndarray, window_size) -> jnp.ndarray:
    """[B,D,H,W,C] -> [B*nW, wd*wh*ww, C]."""
    B, D, H, W, C = x.shape
    wd, wh, ww = window_size
    x = x.reshape(B, D // wd, wd, H // wh, wh, W // ww, ww, C)
    return x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww, C)


def window_reverse(windows: jnp.ndarray, window_size, B, D, H, W) -> jnp.ndarray:
    wd, wh, ww = window_size
    x = windows.reshape(B, D // wd, H // wh, W // ww, wd, wh, ww, -1)
    return x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, D, H, W, -1)


def get_window_size(x_size, window_size, shift_size=None):
    """Clamp window to the input size, zeroing shifts on clamped axes
    (video_swin_transformer.py:92-105)."""
    use_w = list(window_size)
    use_s = list(shift_size) if shift_size is not None else None
    for i in range(len(x_size)):
        if x_size[i] <= window_size[i]:
            use_w[i] = x_size[i]
            if use_s is not None:
                use_s[i] = 0
    if use_s is None:
        return tuple(use_w)
    return tuple(use_w), tuple(use_s)


class WindowAttention3D(nn.Module):
    """W-MSA with 3-D relative position bias
    (video_swin_transformer.py:108-190)."""

    dim: int
    window_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool = True

    def setup(self):
        wd, wh, ww = self.window_size
        self.relative_position_bias_table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * wd - 1) * (2 * wh - 1) * (2 * ww - 1), self.num_heads))
        self.qkv = dense(self.dim, self.dim * 3, bias=self.qkv_bias)
        self.proj = dense(self.dim, self.dim)

    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 actual_window: Optional[Tuple[int, int, int]] = None) -> jnp.ndarray:
        B_, N, C = x.shape
        H = self.num_heads
        head = C // H
        qkv_flat = self.qkv(x)  # [B_, N, 3C], lane order (3, head, D)

        # Bug-compatible with the reference (…py:172): the bias index grid is
        # always the *configured* window's, sliced [:N, :N].  When the window
        # is clamped on small inputs this mis-addresses the table exactly as
        # the torch code does; at the production 224x384 resolution windows
        # never clamp (only shifts zero out), so the two agree.
        full_n = int(np.prod(self.window_size))
        if (N == full_n
                and os.environ.get("MSPI_SWIN_SEP_DTABLE", "1") == "1"):
            # unclamped window: separable-scatter custom bwd (see _bias_rows)
            bias = _bias_rows(self.relative_position_bias_table,
                              tuple(self.window_size))
        else:
            idx = _rel_pos_index(*self.window_size)[:N, :N]
            bias = self.relative_position_bias_table[
                np.asarray(idx).reshape(-1)]
        bias = bias.reshape(N, N, -1).transpose(2, 0, 1)  # [H, N, N]

        from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret

        from mspi_tpu.ops.pallas.attention import (
            fused_window_attention, packed_window_attention_fits)

        if pallas_enabled() and packed_window_attention_fits(
                N, C, H, qkv_flat.dtype.itemsize, mask is not None,
                qkv_flat.dtype.itemsize):
            # fused VMEM-resident kernel consuming the packed qkv projection
            # directly: no per-head slice/transpose copies, no 32-lane
            # padding of q/k/v, scores never touch HBM.  Many-head stages
            # whose resident [H,N,N] bias would blow VMEM (Swin stage 4,
            # 24 heads) take the jnp path below instead.

            nW = mask.shape[0] if mask is not None else 1
            out = fused_window_attention(
                qkv_flat, bias.astype(qkv_flat.dtype),
                None if mask is None else mask.astype(qkv_flat.dtype),
                num_heads=H, num_windows=nW, interpret=pallas_interpret())
            return self.proj(out)

        qkv = qkv_flat.reshape(B_, N, 3, H, head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head ** -0.5)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(B_ // nW, nW, H, N, N) + mask[None, :, None]
            attn = attn.reshape(B_, H, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B_, N, C)
        return self.proj(out)


class Mlp(nn.Module):
    dim: int
    hidden: int

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden)
        self.fc2 = dense(self.hidden, self.dim)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class SwinTransformerBlock3D(nn.Module):
    """(Shifted-)window attention block (video_swin_transformer.py:193-293)."""

    dim: int
    num_heads: int
    window_size: Tuple[int, int, int] = (2, 7, 7)
    shift_size: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True

    def setup(self):
        self.norm1 = layernorm()
        self.attn = WindowAttention3D(self.dim, self.window_size, self.num_heads,
                                      self.qkv_bias)
        self.norm2 = layernorm()
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio))

    def _attention_part(self, x, mask):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size((D, H, W), self.window_size,
                                                  self.shift_size)
        x = self.norm1(x)
        pad_d = (window_size[0] - D % window_size[0]) % window_size[0]
        pad_b = (window_size[1] - H % window_size[1]) % window_size[1]
        pad_r = (window_size[2] - W % window_size[2]) % window_size[2]
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_b), (0, pad_r), (0, 0)))
        _, Dp, Hp, Wp, _ = x.shape
        if any(s > 0 for s in shift_size):
            x = jnp.roll(x, (-shift_size[0], -shift_size[1], -shift_size[2]),
                         axis=(1, 2, 3))
            attn_mask = mask
        else:
            attn_mask = None
        windows = window_partition(x, window_size)
        attn_windows = self.attn(windows, attn_mask, actual_window=window_size)
        x = window_reverse(attn_windows, window_size, B, Dp, Hp, Wp)
        if any(s > 0 for s in shift_size):
            x = jnp.roll(x, shift_size, axis=(1, 2, 3))
        if pad_d or pad_b or pad_r:
            x = x[:, :D, :H, :W]
        return x

    def __call__(self, x, mask, train: bool = False):
        from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_mlp

        x = x + self._attention_part(x, mask)
        # deterministic gates the inference-only paths (int8 via
        # MSPI_QUANT=int8, and the fwd-only VMEM budget for the stage-4
        # 768x3072 MLP whose backward accumulators would not fit)
        y = maybe_fused_ln_mlp(self.norm2, self.mlp, x,
                               deterministic=not train)
        x = x + (y if y is not None else self.mlp(self.norm2(x)))
        return x


class PatchMerging(nn.Module):
    """2x2 spatial merge: concat 4 neighbours -> LN -> Linear 4C->2C
    (video_swin_transformer.py:296-329)."""

    dim: int

    def setup(self):
        self.reduction = dense(4 * self.dim, 2 * self.dim, bias=False)
        self.norm = layernorm()

    def __call__(self, x):
        B, D, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x = jnp.concatenate([x[:, :, 0::2, 0::2], x[:, :, 1::2, 0::2],
                             x[:, :, 0::2, 1::2], x[:, :, 1::2, 1::2]], axis=-1)
        return self.reduction(self.norm(x))


class BasicLayer(nn.Module):
    """One Swin stage (video_swin_transformer.py:349-431); returns
    (downsampled, pre-downsample)."""

    dim: int
    depth: int
    num_heads: int
    window_size: Tuple[int, int, int]
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    has_downsample: bool = True
    remat: bool = False

    def setup(self):
        shift = tuple(w // 2 for w in self.window_size)
        # static_argnums counts __call__'s args WITH self (flax subtracts
        # 1): train=3 is a static bool; mask (2) stays traced
        block_cls = (nn.remat(SwinTransformerBlock3D, static_argnums=(3,))
                     if self.remat else SwinTransformerBlock3D)
        self.blocks = ModuleList([
            block_cls(
                self.dim, self.num_heads, self.window_size,
                (0, 0, 0) if i % 2 == 0 else shift, self.mlp_ratio, self.qkv_bias)
            for i in range(self.depth)
        ])
        if self.has_downsample:
            self.downsample = PatchMerging(self.dim)

    def __call__(self, x, train: bool = False):
        B, D, H, W, C = x.shape
        window_size, shift_size = get_window_size(
            (D, H, W), self.window_size, tuple(w // 2 for w in self.window_size))
        Dp = -(-D // window_size[0]) * window_size[0]
        Hp = -(-H // window_size[1]) * window_size[1]
        Wp = -(-W // window_size[2]) * window_size[2]
        mask = jnp.asarray(_attn_mask(Dp, Hp, Wp, window_size, shift_size))
        for blk in self.blocks.layers:
            # positional train: jax.checkpoint statics are positional
            x = blk(x, mask, train)
        if self.has_downsample:
            return self.downsample(x), x
        return x, x


class VideoSwinFeatures(nn.Module):
    """[B,16,H,W,3] -> pre-downsample pyramid (96,192,384,768), T=8."""

    cfg: VideoSwinConfig
    # per-block rematerialisation: store only block inputs for backward,
    # recompute internals (jax.checkpoint) — trades ~1 extra block forward
    # for the dominant activation memory (needed to train at batch 4 on a
    # 16 GB chip).
    remat: bool = False

    def setup(self):
        c = self.cfg
        self.patch_embed = PatchEmbed3D(c.patch_size, c.embed_dim,
                                        use_norm=False)  # patch_norm=False default
        self.layers = ModuleList([
            BasicLayer(
                dim=int(c.embed_dim * 2 ** i),
                depth=c.depths[i],
                num_heads=c.num_heads[i],
                window_size=c.window_size,
                mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias,
                has_downsample=(i < len(c.depths) - 1),
                remat=self.remat,
            )
            for i in range(len(c.depths))
        ])

    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = self.patch_embed(x)
        features = []
        for layer in self.layers.layers:
            x, pre = layer(x, train=train)
            features.append(pre)
        return features


class PatchEmbed3D(nn.Module):
    """(2,4,4) patchify conv (video_swin_transformer.py:434-473);
    SwinTransformer3D() is built with patch_norm=False."""

    patch_size: Tuple[int, int, int]
    embed_dim: int
    use_norm: bool = False

    def setup(self):
        self.proj = stem_conv3d(3, self.embed_dim, self.patch_size,
                                self.patch_size, 0)
        if self.use_norm:
            self.norm = layernorm()

    def __call__(self, x):
        B, D, H, W, C = x.shape
        pd, ph, pw = self.patch_size
        pads = ((0, 0), (0, (pd - D % pd) % pd), (0, (ph - H % ph) % ph),
                (0, (pw - W % pw) % pw), (0, 0))
        if any(p[1] for p in pads):
            x = jnp.pad(x, pads)
        x = self.proj(x)
        if self.use_norm:
            x = self.norm(x)
        return x
