"""MViTv2-S video backbone: pooled attention + decomposed relative positions.

Reference: /root/reference/backbones/MViT.py with configs/MVITv2_S_16x4.yaml:
16 blocks, embed 96->768 (dim x2 at blocks 1/3/14, dim_mul_in_att), heads
1->8, conv-mode q/kv pooling (depthwise 3x3x3, q stride (1,2,2) at the
transition blocks, adaptive kv stride from (1,8,8)), decomposed spatial +
temporal relative position biases, residual pooling, no cls token, no abs
pos.  Pyramid tapped after blocks {0,2,13,15} (MViT.py:2061-2074) at
strides 4/8/16/32 with T=8.

TPU notes: tokens stay [B, N, C] with a statically-tracked (T,H,W); the
depthwise pooling convs run channels-last over [B*heads, T, H, W, head_dim];
rel-pos tables are interpolated (half-pixel linear, matching
F.interpolate(mode='linear')) to the runtime geometry at trace time, so
non-square inputs (224x384) work exactly as the torch code does.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mspi_tpu.config import MViTConfig
from mspi_tpu.models.videoswin import ModuleList
from mspi_tpu.ops import (DropPath, conv3d, dense, gelu, layernorm, max_pool,
                          resize_to, trunc_normal_init)
from mspi_tpu.ops.layers import (default_compute_dtype, dense_split,
                                 stem_conv3d, torch_kernel_init)


def round_width(width, multiplier, min_width=1, divisor=1):
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def get_rel_pos(rel_pos: jnp.ndarray, d: int) -> jnp.ndarray:
    """Linear-interpolate a rel-pos table to length d (MViT.py:207-220)."""
    if rel_pos.shape[0] == d:
        return rel_pos
    return resize_to(rel_pos, [d], [0])


def _axis_table(rel_pos, q_n, k_n, dtype):
    """Gather + interpolate one decomposed rel-pos table to the runtime
    geometry: [q_n, k_n, dim] in the activation dtype (casting the SMALL
    table before the einsum keeps the big projection bf16 — r5)."""
    d = int(2 * max(q_n, k_n) - 1)
    q_ratio = max(k_n / q_n, 1.0)
    k_ratio = max(q_n / k_n, 1.0)
    dist = (np.arange(q_n)[:, None] * q_ratio
            - np.arange(k_n)[None, :] * k_ratio + (k_n - 1) * k_ratio)
    return get_rel_pos(rel_pos, d)[dist.astype(np.int64)].astype(dtype)


def rel_proj_spatial(q, q_shape, k_shape, rel_pos_h, rel_pos_w):
    """Per-query spatial rel-pos projections (the q . R einsums of
    MViT.py:905-955): [B,H,Nq,k_h] and [B,H,Nq,k_w]."""
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    Rh = _axis_table(rel_pos_h, q_h, k_h, q.dtype)
    Rw = _axis_table(rel_pos_w, q_w, k_w, q.dtype)

    B, n_head, _, dim = q.shape
    q_n = q_t * q_h * q_w
    r_q = q.reshape(B, n_head, q_t, q_h, q_w, dim)
    rel_h_q = jnp.einsum("bythwc,hkc->bythwk", r_q, Rh)  # [B,H,qt,qh,qw,k_h]
    rel_w_q = jnp.einsum("bythwc,wkc->bythwk", r_q, Rw)  # [B,H,qt,qh,qw,k_w]
    return (rel_h_q.reshape(B, n_head, q_n, k_h),
            rel_w_q.reshape(B, n_head, q_n, k_w))


def cal_rel_pos_spatial(attn, q, q_shape, k_shape, rel_pos_h, rel_pos_w):
    """Decomposed spatial rel-pos bias (MViT.py:905-955), no cls token."""
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, n_head, _, dim = q.shape
    q_n = q_t * q_h * q_w
    k_n = k_t * k_h * k_w
    rel_h_q, rel_w_q = rel_proj_spatial(q, q_shape, k_shape,
                                        rel_pos_h, rel_pos_w)

    # Expand each decomposed bias to the flat key axis with <=6-D tensors —
    # the torch code reshapes attn to 8-D (MViT.py:1001-1010), which is
    # numerically identical but pathological for TPU layout assignment.
    bias_h = jnp.broadcast_to(
        rel_h_q.reshape(B, n_head, q_n, 1, k_h, 1),
        (B, n_head, q_n, k_t, k_h, k_w)).reshape(B, n_head, q_n, k_n)
    bias_w = jnp.broadcast_to(
        rel_w_q.reshape(B, n_head, q_n, 1, 1, k_w),
        (B, n_head, q_n, k_t, k_h, k_w)).reshape(B, n_head, q_n, k_n)
    return attn + bias_h + bias_w


def rel_proj_temporal(q, q_shape, k_shape, rel_pos_t):
    """Per-query temporal rel-pos projection: [B,H,Nq,k_t]."""
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    Rt = _axis_table(rel_pos_t, q_t, k_t, q.dtype)  # [q_t, k_t, dim]

    B, n_head, _, dim = q.shape
    q_n = q_t * q_h * q_w
    r_q = q.reshape(B, n_head, q_t, q_h, q_w, dim)
    rel_b = jnp.einsum("bythwc,tkc->bythwk", r_q, Rt)  # [B,H,qt,qh,qw,k_t]
    return rel_b.reshape(B, n_head, q_n, k_t)


def rel_proj_packed(q4, q_shape, k_shape, rel_pos_t, rel_pos_h, rel_pos_w):
    """Packed-layout rel projections: q4 is the normed pooled query as
    [B, Nq, H, D]; returns [B, Nq, H*R] with R = k_t + k_h + k_w lanes per
    head (concat order t|h|w, matching _onehot_rows stacking)."""
    B, Nq, H, D = q4.shape
    q_t, q_h, q_w = q_shape
    r6 = q4.reshape(B, q_t, q_h, q_w, H, D)
    outs = []
    if rel_pos_t is not None:
        Rt = _axis_table(rel_pos_t, q_t, k_shape[0], q4.dtype)
        outs.append(jnp.einsum("btyxhd,tkd->btyxhk", r6, Rt))
    if rel_pos_h is not None:
        Rh = _axis_table(rel_pos_h, q_h, k_shape[1], q4.dtype)
        Rw = _axis_table(rel_pos_w, q_w, k_shape[2], q4.dtype)
        outs.append(jnp.einsum("btyxhd,ykd->btyxhk", r6, Rh))
        outs.append(jnp.einsum("btyxhd,xkd->btyxhk", r6, Rw))
    rel = jnp.concatenate(outs, axis=-1)  # [B,qt,qh,qw,H,R]
    return rel.reshape(B, Nq, -1)


def cal_rel_pos_temporal(attn, q, q_shape, k_shape, rel_pos_t):
    """Temporal rel-pos bias (MViT.py:958-997), no cls token."""
    q_t, q_h, q_w = q_shape
    k_t, k_h, k_w = k_shape
    B, n_head, _, dim = q.shape
    q_n = q_t * q_h * q_w
    k_n = k_t * k_h * k_w
    rel_b = rel_proj_temporal(q, q_shape, k_shape, rel_pos_t)

    bias_t = jnp.broadcast_to(
        rel_b.reshape(B, n_head, q_n, k_t, 1, 1),
        (B, n_head, q_n, k_t, k_h, k_w)).reshape(B, n_head, q_n, k_n)
    return attn + bias_t


def _onehot_rows(axis: str, k_shape) -> np.ndarray:
    """Static 0/1 expansion matrix mapping a decomposed rel-pos axis to the
    flat key index (row-major t,h,w): E[a, j] = 1 iff key j's `axis`
    coordinate equals a."""
    k_t, k_h, k_w = k_shape
    idx = np.arange(k_t * k_h * k_w)
    if axis == "t":
        a, n = idx // (k_h * k_w), k_t
    elif axis == "h":
        a, n = (idx // k_w) % k_h, k_h
    else:
        a, n = idx % k_w, k_w
    E = np.zeros((n, idx.size), np.float32)
    E[a, idx] = 1.0
    return E


def augment_for_fused_attn(q, k, q_shape, k_shape, scale,
                           rel_pos_t=None, rel_pos_h=None, rel_pos_w=None):
    """Fold MViT's decomposed rel-pos bias into the attention contraction:
    q gains the per-query rel projections as extra lanes, k gains the
    matching static 0/1 expansion rows, so softmax((q*scale) k^T + bias)
    == softmax(q_aug k_aug^T).  head_dim 96 + (8+7+12) bias lanes = 123,
    one MXU lane tile — the bias costs nothing extra in the fused kernel
    and its gradient falls out of dq_aug/dk_aug."""
    B, H, _, _ = q.shape
    cols = [q * scale]
    rows = []
    # The rel-pos tables are fp32 params, so the projections come out fp32;
    # cast back to q.dtype before concat or q_aug promotes to fp32 and the
    # fused kernel's matmuls lose the bf16 MXU rate (scores still accumulate
    # fp32 inside the kernel).
    if rel_pos_t is not None:
        cols.append(rel_proj_temporal(q, q_shape, k_shape, rel_pos_t)
                    .astype(q.dtype))
        rows.append(_onehot_rows("t", k_shape))
    if rel_pos_h is not None:
        rh, rw = rel_proj_spatial(q, q_shape, k_shape, rel_pos_h, rel_pos_w)
        cols += [rh.astype(q.dtype), rw.astype(q.dtype)]
        rows += [_onehot_rows("h", k_shape), _onehot_rows("w", k_shape)]
    q_aug = jnp.concatenate(cols, axis=-1)
    if not rows:
        return q_aug, k
    E = jnp.asarray(np.concatenate(rows, axis=0).T, k.dtype)  # [Nk, R]
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(E[None, None], (B, H, *E.shape))], axis=-1)
    return q_aug, k_aug


def _packed_pool_conv(x5, w, stride, padding, head_dim):
    """H lane-sliced per-head depthwise convs on a packed [B,T,H,W,HD] stream.

    Returns [B, heads, N', D].  Each slice is a clean head_dim-wide depthwise
    conv on XLA's fast path (the filter is shared across heads,
    MViT.py:1090-1135).  The pooled (T',H',W') is computed statically at the
    call site — it must NOT be returned from here, or custom_vjp would trace
    the python ints into arrays."""
    D = head_dim
    outs = []
    for h in range(x5.shape[-1] // D):
        y = jax.lax.conv_general_dilated(
            jax.lax.slice_in_dim(x5, h * D, (h + 1) * D, axis=4), w,
            window_strides=stride, padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=D)
        outs.append(y.reshape(y.shape[0], 1, -1, D))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _packed_pool(x5, w, stride, padding, head_dim):
    """_packed_pool_conv with a hand-written bwd: JAX's autodiff of the H
    `slice_in_dim`s materializes H full-size pad+add passes to rebuild the
    packed dx (measured -7% on flagship training); here each head's dx/dw
    comes from `jax.linear_transpose` of its conv (no forward recompute) and
    the packed dx is assembled with ONE lane concat.

    Caveats (advisor r3): (1) the residuals save the full-size packed x5
    (needed for dw), and jax.checkpoint cannot rematerialize through a
    custom_vjp — under remat/reversible training with MSPI_POOL_PACKED_TRAIN=1
    activation memory GROWS vs the per-head autodiff path; (2) custom_vjp is
    reverse-mode-only — jax.jvp / forward-over-reverse through this path
    raises; set MSPI_POOL_PACKED=0 (or add a custom_jvp companion) if ever
    needed."""
    return _packed_pool_conv(x5, w, stride, padding, head_dim)


def _packed_pool_fwd(x5, w, stride, padding, head_dim):
    return _packed_pool_conv(x5, w, stride, padding, head_dim), (x5, w)


def _packed_pool_bwd(stride, padding, head_dim, res, dy):
    x5, w = res
    D = head_dim
    B, T, Hh, Ww, HD = x5.shape
    H = HD // D
    xh_spec = jax.ShapeDtypeStruct((B, T, Hh, Ww, D), x5.dtype)
    w_spec = jax.ShapeDtypeStruct(w.shape, w.dtype)

    def conv_x(xh):
        return jax.lax.conv_general_dilated(
            xh, w, window_strides=stride, padding=padding,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            feature_group_count=D)

    oshape = jax.eval_shape(conv_x, xh_spec).shape
    dxs = []
    dw = jnp.zeros(w.shape, w.dtype)
    for h in range(H):
        dy_h = dy[:, h].reshape(oshape)
        dxs.append(jax.linear_transpose(conv_x, xh_spec)(dy_h)[0])
        xh = jax.lax.slice_in_dim(x5, h * D, (h + 1) * D, axis=4)

        def conv_w(ww):
            return jax.lax.conv_general_dilated(
                xh, ww, window_strides=stride, padding=padding,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=D)

        dw = dw + jax.linear_transpose(conv_w, w_spec)(dy_h)[0]
    dx = jnp.concatenate(dxs, axis=-1) if H > 1 else dxs[0]
    return dx, dw


_packed_pool.defvjp(_packed_pool_fwd, _packed_pool_bwd)


class HeadPool(nn.Module):
    """Depthwise attention-stream pooling (conv-mode attention_pool,
    MViT.py:170-204, 1090-1135) on head-major [B, H, N, head] streams.

    Param tree is identical to the nn.Conv the torch weights map to
    (kernel [kt,kh,kw,1,head_dim]).  A packed-layout variant (one
    feature-grouped conv on [B,N,H*head] with the filter tiled across
    heads) measured 0.03 ms standalone but ~13 ms inside the full flagship
    graph — XLA rewrote the grouped conv out of its depthwise fast path
    under the model's layout constraints (r3 null; see ROUND3_NOTES.md) —
    so the pools stay per-head.

    `packed=True` instead consumes the qkv dense's native [B, N, H*head]
    output and runs H lane-sliced per-head convs (each a clean head_dim-
    wide depthwise conv on XLA's fast path — the filter is shared across
    heads, MViT.py:1090-1135), assembling the head-major [B, H, N', head]
    result only AFTER pooling, where N' is 4-64x smaller.  This removes
    the pre-pool [B,N,H,head] head-split transposes the r3 profile showed
    at ~1.8 ms each on the stage-transition blocks (copy.4115/.4130/.4137
    bf16[8,2,43008,96])."""

    head_dim: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int],
                 packed: bool = False, packed_out: bool = False):
        T, Hh, Ww = thw
        w = self.param("kernel", torch_kernel_init,
                       (*self.kernel, 1, self.head_dim))
        from flax.linen.dtypes import promote_dtype

        x, w = promote_dtype(x, w, dtype=default_compute_dtype())
        if packed:
            if x.ndim == 5:
                # already [B,T,H,W,HD] straight from the 5-D qkv dense — no
                # token->grid relayout copy (r5: the three [B,N,HD] reshape
                # copies at the stage-transition blocks were ~3.2 ms/iter)
                x5 = x
            else:
                B, N, HD = x.shape
                x5 = x.reshape(B, T, Hh, Ww, HD)
            oshape = tuple((s + 2 * (k // 2) - k) // st + 1
                           for s, k, st in zip((T, Hh, Ww), self.kernel,
                                               self.stride))
            if os.environ.get("MSPI_POOL_FAT", "0") == "1":
                # r5: ONE full-depthwise conv on all H*D packed lanes — the
                # shared per-head filter (MViT.py:1090-1135) tiled across
                # heads at trace time.  Replaces H lane-sliced per-head convs
                # (each slice a relayout; mvit.py:202 was ~6% of the step)
                # with a single fast-path depthwise conv; the r3 "fat
                # grouped conv" null predates the 5-D C-minor qkv layout.
                heads = x5.shape[-1] // self.head_dim
                wf = jnp.tile(w, (1, 1, 1, 1, heads))
                y = jax.lax.conv_general_dilated(
                    x5, wf, window_strides=tuple(self.stride),
                    padding=[(k // 2, k // 2) for k in self.kernel],
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    feature_group_count=x5.shape[-1])
                bsz = y.shape[0]
                if packed_out:
                    # stay token-major [B, N', H*D] for the packed kernel
                    return y.reshape(bsz, -1, y.shape[-1]), oshape
                out = (y.reshape(bsz, -1, heads, self.head_dim)
                       .transpose(0, 2, 1, 3))
                return out, oshape
            out = _packed_pool(
                x5, w, tuple(self.stride),
                tuple((k // 2, k // 2) for k in self.kernel), self.head_dim)
            return out, oshape
        B, H, N, D = x.shape
        kt, kh, kw = self.kernel
        if (kt > 1 and kt % 2 == 1 and self.stride[0] == 1 and T > 1
                and os.environ.get("MSPI_POOL_TSPLIT", "0") == "1"):
            # Exact temporal-slice decomposition: kt bt-flattened 2-D
            # kh x kw depthwise convs (XLA's fast path) + a shifted
            # temporal sum:  out[t] = sum_dt conv2d(x[t + dt - kt//2], w[dt])
            # Measured NULL on the flagship (62.5 vs 63.7 clips/s): the kt
            # materialized full-size conv outputs + shifted adds cost more
            # than the slow 5-D depthwise lowering they replace.  Kept
            # gated (default off) with a parity test; see ROUND3_NOTES.md.
            x4 = x.reshape(B * H * T, Hh, Ww, D)
            parts = []
            for dt in range(kt):
                c = jax.lax.conv_general_dilated(
                    x4, w[dt],
                    window_strides=self.stride[1:],
                    padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=D)
                parts.append(c.reshape(B * H, T, *c.shape[1:]))
            y = parts[kt // 2]
            for dt, c in enumerate(parts):
                s = dt - kt // 2
                if s > 0:
                    y = y + jnp.pad(c[:, s:], ((0, 0), (0, s), (0, 0),
                                               (0, 0), (0, 0)))
                elif s < 0:
                    y = y + jnp.pad(c[:, :s], ((0, 0), (-s, 0), (0, 0),
                                               (0, 0), (0, 0)))
        else:
            from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret
            from mspi_tpu.ops.pallas.dwconv import (dwconv3d_supported,
                                                    fused_dwconv3d)

            x5 = x.reshape(B * H, T, Hh, Ww, D)
            if (pallas_enabled()
                    and os.environ.get("MSPI_DWCONV", "0") == "1"
                    and dwconv3d_supported(x5.shape, self.kernel,
                                           self.stride)):
                # Measured NULL (60.2 vs 63.7 clips/s flagship): isolated
                # XLA already runs this conv at 3.4 TFLOP/s
                # (tools/bench_dwconv3d.py) — the 4.3 ms the r3 profile
                # attributes to it is a layout/fusion artifact of the full
                # graph, and the Pallas kernel (0.61 TFLOP/s: serialized
                # slab DMAs + unaligned sublane taps) loses to both.
                # Opt-in via MSPI_DWCONV=1; see ROUND3_NOTES.md.
                y = fused_dwconv3d(x5, w, interpret=pallas_interpret())
            else:
                y = jax.lax.conv_general_dilated(
                    x5, w,
                    window_strides=self.stride,
                    padding=[(k // 2, k // 2) for k in self.kernel],
                    dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    feature_group_count=D)
        return y.reshape(B, H, -1, D), tuple(y.shape[1:4])


class MultiScaleAttention(nn.Module):
    """Pooled multi-head attention (MViT.py:1016-1308), conv mode, fused qkv,
    no cls token, residual pooling."""

    dim: int
    dim_out: int
    input_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]
    rel_pos_spatial: bool = True
    rel_pos_temporal: bool = True
    residual_pooling: bool = True

    def setup(self):
        head_dim = self.dim_out // self.num_heads
        # dense_split: identical param tree to the fused qkv Linear, but the
        # weight is sliced at trace time so q/k/v come out of the matmul
        # lane-packed [B, N, H*head] with no [3,B,H,N,D] transpose+slice
        # copies (profiled at ~9 ms/iter on the flagship stage-1 blocks).
        self.qkv = dense_split(self.dim, self.dim_out * 3,
                               (self.dim_out, 2 * self.dim_out),
                               bias=self.qkv_bias)
        self.proj = dense(self.dim_out, self.dim_out)

        self.has_pool_q = not (math.prod(self.kernel_q) == 1 and math.prod(self.stride_q) == 1)
        self.has_pool_kv = not (math.prod(self.kernel_kv) == 1 and math.prod(self.stride_kv) == 1)

        def pool_conv(kernel, stride):
            return HeadPool(head_dim, tuple(kernel), tuple(stride))

        if self.has_pool_q:
            self.pool_q = pool_conv(self.kernel_q, self.stride_q)
            self.norm_q = layernorm(epsilon=1e-6)
        if self.has_pool_kv:
            self.pool_k = pool_conv(self.kernel_kv, self.stride_kv)
            self.norm_k = layernorm(epsilon=1e-6)
            self.pool_v = pool_conv(self.kernel_kv, self.stride_kv)
            self.norm_v = layernorm(epsilon=1e-6)

        if self.rel_pos_spatial:
            size = self.input_size[1]
            q_size = size // self.stride_q[1]
            kv_size = size // self.stride_kv[1]
            rel_sp_dim = 2 * max(q_size, kv_size) - 1
            ti = trunc_normal_init(0.02)
            self.rel_pos_h = self.param("rel_pos_h", ti, (rel_sp_dim, head_dim))
            self.rel_pos_w = self.param("rel_pos_w", ti, (rel_sp_dim, head_dim))
        if self.rel_pos_temporal:
            self.rel_pos_t = self.param("rel_pos_t", trunc_normal_init(0.02),
                                        (2 * 8 - 1, head_dim))

    def __call__(self, x: jnp.ndarray, thw: Tuple[int, int, int],
                 train: bool = False):
        B, N, _ = x.shape
        H = self.num_heads
        head = self.dim_out // H
        packed_env_early = os.environ.get("MSPI_POOL_PACKED", "1") == "1"
        packed_early = H > 1 and packed_env_early and (
            not train
            or os.environ.get("MSPI_POOL_PACKED_TRAIN", "0") == "1")
        # q/k/v come out of the sliced matmul packed [B, N, H*head] — no
        # [3,B,H,N,D] transpose+slice copies (profiled ~9 ms/iter on the
        # stage-1 blocks); each stream pays one head split (free for H == 1).
        # On the packed-pool path the dense consumes a 5-D [B,T,H,W,C] view
        # so its outputs are born grid-shaped C-minor and the pools take
        # them without a token->grid relayout (r5, ~3.2 ms/iter).
        if (packed_early and (self.has_pool_q or self.has_pool_kv)
                and os.environ.get("MSPI_QKV5D", "1") == "1"):
            q, k, v = self.qkv(x.reshape(B, *thw, x.shape[-1]))
        else:
            q, k, v = self.qkv(x)

        def heads(y):
            return y.reshape(B, -1, H, head).transpose(0, 2, 1, 3)

        # For H > 1 at inference, pool straight from the packed stream (H
        # lane-sliced per-head convs) and assemble head-major only on the
        # pooled output — the pre-pool head-split transposes were ~1.8 ms
        # each on the stage-transition blocks (see HeadPool docstring).
        # Inference gains 7.7% (71.9 -> 77.5 clips/s).  Training stays
        # per-head: BOTH bwd variants regress ~7-8% at batch 2 bf16 — naive
        # autodiff (per-slice pad+add dx) 27.05, and _packed_pool's
        # custom_vjp (one-lane-concat dx via linear_transpose) 26.69, vs
        # 29.04 per-head control — the cost is the H per-head transposed
        # convs on lane-sliced streams, not the dx assembly.  Opt-in via
        # MSPI_POOL_PACKED_TRAIN=1 (grad-parity-tested).
        packed_pool = packed_early

        from mspi_tpu.ops.pallas import pallas_enabled, pallas_interpret

        # statically-known pooled kv token count (pool: k//2 pad, stride st)
        nk_static = 1
        for s, kk, st in zip(thw, self.kernel_kv, self.stride_kv):
            nk_static *= (s + 2 * (kk // 2) - kk) // st + 1
        fully_packed = (
            packed_pool
            and self.has_pool_q and self.has_pool_kv
            and (self.rel_pos_temporal or self.rel_pos_spatial)
            and pallas_enabled() and nk_static <= 4096
            and os.environ.get("MSPI_POOL_FAT", "0") == "1"
            and os.environ.get("MSPI_ATTN_RELK", "1") == "1"
            and os.environ.get("MSPI_ATTN_PACKED", "0") == "1")
        if fully_packed:
            # r5 packed block: fat depthwise pools emit token-major
            # [B,N',H*D]; norms run on the free [B,N',H,D] lane view; the
            # rel projections and the attention kernel (incl. the
            # residual_pooling add) stay packed; proj consumes the kernel
            # output directly.  No head-major transpose exists anywhere.
            from mspi_tpu.ops.pallas.pooled_attention import \
                fused_attention_rel_packed

            qp, q_shape = self.pool_q(q, thw, packed=True, packed_out=True)
            q4 = self.norm_q(qp.reshape(B, -1, H, head))
            kp, k_shape = self.pool_k(k, thw, packed=True, packed_out=True)
            kp = self.norm_k(kp.reshape(B, -1, H, head)).reshape(
                B, -1, self.dim_out)
            vp, _ = self.pool_v(v, thw, packed=True, packed_out=True)
            vp = self.norm_v(vp.reshape(B, -1, H, head)).reshape(
                B, -1, self.dim_out)
            rel = rel_proj_packed(
                q4, q_shape, k_shape,
                self.rel_pos_t if self.rel_pos_temporal else None,
                self.rel_pos_h if self.rel_pos_spatial else None,
                self.rel_pos_w if self.rel_pos_spatial else None)
            rows = []
            if self.rel_pos_temporal:
                rows.append(_onehot_rows("t", k_shape))
            if self.rel_pos_spatial:
                rows += [_onehot_rows("h", k_shape),
                         _onehot_rows("w", k_shape)]
            E = jnp.asarray(np.concatenate(rows, axis=0).T, kp.dtype)
            out = fused_attention_rel_packed(
                q4.reshape(B, -1, self.dim_out), kp, vp, rel, E,
                heads=H, scale=head ** -0.5,
                residual=self.residual_pooling,
                interpret=pallas_interpret())
            return self.proj(out), q_shape

        if self.has_pool_q:
            q, q_shape = self.pool_q(q if packed_pool else heads(q), thw,
                                     packed=packed_pool)
            q = self.norm_q(q)
        else:
            q = heads(q)
            q_shape = thw
        if self.has_pool_kv:
            k, k_shape = self.pool_k(k if packed_pool else heads(k), thw,
                                     packed=packed_pool)
            k = self.norm_k(k)
            v, _ = self.pool_v(v if packed_pool else heads(v), thw,
                               packed=packed_pool)
            v = self.norm_v(v)
        else:
            k = heads(k)
            v = heads(v)
            k_shape = thw

        from mspi_tpu.ops.pallas import pallas_enabled

        # Fused Pallas path: after kv pooling Nk is small enough (<=2688 at
        # the reference resolution, incl. the q-pooling stage-transition
        # blocks) that the whole [TQ, Nk] score tile lives in VMEM (the
        # kernel shrinks TQ to budget) and the [B,H,Nq,Nk] tensor never
        # round-trips HBM — the jnp fallback on the three transition blocks
        # was ~19% of the flagship step (profiled r2).
        if pallas_enabled() and k.shape[2] <= 4096:
            from mspi_tpu.ops.pallas import pallas_interpret
            from mspi_tpu.ops.pallas.pooled_attention import (
                fused_attention, fused_attention_rel)

            has_rel = self.rel_pos_temporal or self.rel_pos_spatial
            if has_rel and os.environ.get("MSPI_ATTN_RELK", "1") == "1":
                # r5: only the NARROW per-query rel projections ([B,H,Nq,R],
                # R = k_t+k_h+k_w) are materialized; the 0/1 key-axis
                # expansion and the q scale move into the kernel, killing
                # the q_aug/k_aug copies (~8 ms/iter of the flagship step).
                cols, rows = [], []
                if self.rel_pos_temporal:
                    cols.append(rel_proj_temporal(q, q_shape, k_shape,
                                                  self.rel_pos_t)
                                .astype(q.dtype))
                    rows.append(_onehot_rows("t", k_shape))
                if self.rel_pos_spatial:
                    rh, rw = rel_proj_spatial(q, q_shape, k_shape,
                                              self.rel_pos_h, self.rel_pos_w)
                    cols += [rh.astype(q.dtype), rw.astype(q.dtype)]
                    rows += [_onehot_rows("h", k_shape),
                             _onehot_rows("w", k_shape)]
                rel = jnp.concatenate(cols, axis=-1)
                E = jnp.asarray(np.concatenate(rows, axis=0).T, k.dtype)
                out = fused_attention_rel(q, k, v, rel, E, head ** -0.5,
                                          interpret=pallas_interpret())
            else:
                q_aug, k_aug = augment_for_fused_attn(
                    q, k, q_shape, k_shape, head ** -0.5,
                    rel_pos_t=self.rel_pos_t if self.rel_pos_temporal else None,
                    rel_pos_h=self.rel_pos_h if self.rel_pos_spatial else None,
                    rel_pos_w=self.rel_pos_w if self.rel_pos_spatial else None)
                out = fused_attention(q_aug, k_aug, v,
                                      interpret=pallas_interpret())
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (head ** -0.5), k)
            if self.rel_pos_spatial:
                attn = cal_rel_pos_spatial(attn, q, q_shape, k_shape,
                                           self.rel_pos_h, self.rel_pos_w)
            if self.rel_pos_temporal:
                attn = cal_rel_pos_temporal(attn, q, q_shape, k_shape,
                                            self.rel_pos_t)
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        if self.residual_pooling:
            out = out + q
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, self.dim_out)
        return self.proj(out), q_shape


class Mlp(nn.Module):
    dim: int
    hidden: int
    out: int

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden)
        self.fc2 = dense(self.hidden, self.out)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class MultiScaleBlock(nn.Module):
    """MViT.py:1311-1434 with DIM_MUL_IN_ATT=True: attention projects to
    dim_out; the skip path is proj(norm1(x)) max-pooled by the q stride."""

    dim: int
    dim_out: int
    num_heads: int
    input_size: Tuple[int, int, int]
    mlp_ratio: float
    qkv_bias: bool
    drop_path: float
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]

    def setup(self):
        self.norm1 = layernorm(epsilon=1e-6)
        self.attn = MultiScaleAttention(
            self.dim, self.dim_out, self.input_size, self.num_heads,
            self.qkv_bias, self.kernel_q, self.kernel_kv, self.stride_q,
            self.stride_kv)
        self.norm2 = layernorm(epsilon=1e-6)
        self.mlp = Mlp(self.dim_out, int(self.dim_out * self.mlp_ratio), self.dim_out)
        if self.dim != self.dim_out:
            self.proj = dense(self.dim, self.dim_out)
        self.dp = DropPath(self.drop_path)
        self.has_pool_skip = math.prod(self.stride_q) > 1

    def _pool_skip(self, x, thw):
        if not self.has_pool_skip:
            return x
        kernel = tuple(s + 1 if s > 1 else s for s in self.stride_q)
        pad = tuple(k // 2 for k in kernel)
        B, N, C = x.shape
        T, Hh, Ww = thw
        y = max_pool(x.reshape(B, T, Hh, Ww, C), kernel, self.stride_q, pad)
        return y.reshape(B, -1, C)

    def __call__(self, x, thw, train: bool = False):
        det = not train
        x_norm = self.norm1(x)
        x_block, thw_new = self.attn(x_norm, thw, train=train)
        if self.dim != self.dim_out:
            x = self.proj(x_norm)
        x_res = self._pool_skip(x, thw)
        x = x_res + self.dp(x_block, deterministic=det)
        from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_mlp

        y = maybe_fused_ln_mlp(self.norm2, self.mlp, x, deterministic=det)
        if y is None:
            y = self.mlp(self.norm2(x))
        x = x + self.dp(y, deterministic=det)
        return x, thw_new


class MViTFeatures(nn.Module):
    """[B,16,H,W,3] -> pyramid (96,192,384,768) tapped at blocks {0,2,13,15}.

    The per-block dim/head/stride schedule replays MViT.py:1777-1903 with
    the MVITv2_S_16x4.yaml settings.
    """

    cfg: MViTConfig
    # per-block jax.checkpoint: keep only block inputs for backward
    remat: bool = False

    def setup(self):
        c = self.cfg
        depth = c.depth
        dim_mul = np.ones(depth + 1)
        head_mul = np.ones(depth + 1)
        for idx, mul in c.dim_mul:
            dim_mul[idx] = mul
        for idx, mul in c.head_mul:
            head_mul[idx] = mul

        stride_q = [list(s[1:]) for s in sorted(c.pool_q_stride)]
        kernel = list(c.pool_kvq_kernel)
        # adaptive kv strides (MViT.py:1799-1812)
        stride_kv = []
        _skv = list(c.pool_kv_stride_adaptive)
        for i in range(depth):
            if math.prod(stride_q[i]) > 0:
                _skv = [max(_skv[d] // stride_q[i][d], 1) for d in range(3)]
            stride_kv.append(list(_skv))

        # train-crop-based geometry for rel-pos table sizing (square 224)
        input_size = [16 // c.patch_stride[0], 224 // c.patch_stride[1],
                      224 // c.patch_stride[2]]
        embed_dim = c.embed_dim
        num_heads = c.num_heads
        dpr = [0.2 * i / (depth - 1) for i in range(depth)]
        blocks = []
        self._tap = set(c.out_indices)
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            dim_out = round_width(embed_dim, dim_mul[i],
                                  divisor=round_width(num_heads, head_mul[i]))
            # static_argnums counts __call__'s args WITH self (flax
            # subtracts 1): thw=2, train=3 — and the call site must pass
            # train positionally (jax.checkpoint statics are positional)
            block_cls = (nn.remat(MultiScaleBlock, static_argnums=(2, 3))
                         if self.remat else MultiScaleBlock)
            blocks.append(block_cls(
                dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                input_size=tuple(input_size), mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias, drop_path=dpr[i],
                kernel_q=tuple(kernel), kernel_kv=tuple(kernel),
                stride_q=tuple(stride_q[i]), stride_kv=tuple(stride_kv[i])))
            if math.prod(stride_q[i]) > 1:
                input_size = [s // st for s, st in zip(input_size, stride_q[i])]
            embed_dim = dim_out
        self.blocks = ModuleList(blocks)
        # static per-block q strides: under nn.remat the aux (x, thw) output
        # round-trips jax.checkpoint and thw comes back *traced*, which would
        # poison every downstream reshape — so thw is replayed statically
        # (q-pool conv: kernel 3/1, padding k//2, stride st -> ceil(in/st))
        self._q_strides = tuple(
            tuple(stride_q[i]) if math.prod(stride_q[i]) > 0 else (1, 1, 1)
            for i in range(depth))
        self.patch_embed = PatchEmbedMViT(c.patch_kernel, c.patch_stride,
                                          c.patch_padding, c.embed_dim)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> List[jnp.ndarray]:
        x, thw = self.patch_embed(x)
        feas = []
        for i, blk in enumerate(self.blocks.layers):
            # positional train: jax.checkpoint's static_argnums only covers
            # positional args
            x, _ = blk(x, thw, train)
            thw = tuple(-(-t // st)
                        for t, st in zip(thw, self._q_strides[i]))
            if i in self._tap:
                T, Hh, Ww = thw
                feas.append(x.reshape(x.shape[0], T, Hh, Ww, -1))
        return feas


class PatchEmbedMViT(nn.Module):
    """(3,7,7)/s(2,4,4)/p(1,3,3) patchify conv returning tokens + (T,H,W)
    (SlowFast/stem_helper.py PatchEmbed as used at MViT.py:1720-1727)."""

    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    embed_dim: int

    def setup(self):
        self.proj = stem_conv3d(3, self.embed_dim, self.kernel, self.stride,
                                self.padding)

    def __call__(self, x):
        y = self.proj(x)
        B, T, H, W, C = y.shape
        return y.reshape(B, T * H * W, C), (T, H, W)
