"""Reversible MViT encoder (Reversible Vision Transformers, CVPR 2022).

Reference: /root/reference/backbones/MViT.py:223-900 — ReversibleMViT with
two-stream ReversibleBlocks (Y1 = X1 + Att(X2); Y2 = X2 + MLP(Y1)),
StageTransitionBlocks at Q-pooling boundaries (TwoStreamFusion 'avg' fusing
the streams, conv res-path), and a custom backward that reconstructs
activations instead of storing them (RevBackProp).

JAX-native memory story: `reversible_sequence` implements the same
O(1)-activation backward as a jax.custom_vjp — the bwd pass inverts each
block (X2 = Y2 - G(Y1); X1 = Y1 - F(X2)) and uses per-block jax.vjp for the
parameter/input cotangents, so no intermediate activations of the reversible
span are kept alive.  (The reference's features-only forward never taps the
rev path — MViT.py:2060-2074 returns an empty pyramid when REV is enabled —
so this module is the framework-capability implementation, exercised by its
own tests.)
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mspi_tpu.config import MViTConfig
from mspi_tpu.models.mvit import (Mlp, MultiScaleAttention, PatchEmbedMViT,
                                  round_width)
from mspi_tpu.models.videoswin import ModuleList
from mspi_tpu.ops import dense, layernorm, max_pool


class MLPSubblock(nn.Module):
    """G: pre-LN MLP (MViT.py:823-847)."""

    dim: int
    mlp_ratio: float = 4.0

    def setup(self):
        self.norm = layernorm(epsilon=1e-6)
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio), self.dim)

    def __call__(self, x):
        return self.mlp(self.norm(x))


class AttentionSubBlock(nn.Module):
    """F: pre-LN pooled attention (MViT.py:850-902); thw is static."""

    dim: int
    dim_out: int
    input_size: Tuple[int, int, int]
    num_heads: int
    qkv_bias: bool
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]

    def setup(self):
        self.norm = layernorm(epsilon=1e-6)
        self.attn = MultiScaleAttention(
            self.dim, self.dim_out, self.input_size, self.num_heads,
            self.qkv_bias, self.kernel_q, self.kernel_kv, self.stride_q,
            self.stride_kv)

    def __call__(self, x, thw):
        out, new_thw = self.attn(self.norm(x), thw)
        return out, new_thw


class ReversibleBlock(nn.Module):
    """Y1 = X1 + F(X2); Y2 = X2 + G(Y1) (MViT.py:642-756). Shapes preserved
    (no pooling / dim change inside reversible blocks)."""

    dim: int
    input_size: Tuple[int, int, int]
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]

    def setup(self):
        self.F = AttentionSubBlock(
            self.dim, self.dim, self.input_size, self.num_heads, self.qkv_bias,
            self.kernel_q, self.kernel_kv, (1, 1, 1), self.stride_kv)
        self.G = MLPSubblock(self.dim, self.mlp_ratio)

    def __call__(self, x1, x2, thw):
        y1 = x1 + self.f_part(x2, thw)
        y2 = x2 + self.g_part(y1)
        return y1, y2

    def f_part(self, x, thw):
        out, _ = self.F(x, thw)
        return out

    def g_part(self, x):
        return self.G(x)


class StageTransitionBlock(nn.Module):
    """Irreversible Q-pooling transition (MViT.py:491-640): fuse the two
    streams ('avg'), pooled+projected residual, F then G with plain
    residuals."""

    dim: int
    dim_out: int
    input_size: Tuple[int, int, int]
    num_heads: int
    mlp_ratio: float
    qkv_bias: bool
    kernel_q: Tuple[int, int, int]
    kernel_kv: Tuple[int, int, int]
    stride_q: Tuple[int, int, int]
    stride_kv: Tuple[int, int, int]

    def setup(self):
        self.F = AttentionSubBlock(
            self.dim, self.dim_out, self.input_size, self.num_heads,
            self.qkv_bias, self.kernel_q, self.kernel_kv, self.stride_q,
            self.stride_kv)
        self.G = MLPSubblock(self.dim_out, self.mlp_ratio)
        if self.dim != self.dim_out:
            self.res_proj = dense(self.dim, self.dim_out)

    def __call__(self, x1, x2, thw):
        x = (x1 + x2) * 0.5  # TwoStreamFusion 'avg' (MViT.py:86-127)
        x_res = self.res_proj(x) if self.dim != self.dim_out else x
        # conv res path (REV.RES_PATH == 'conv' default): pool with F's
        # q-pooling conv per head, incl. its post-pool norm
        B, L, C = x_res.shape
        H = self.F.attn.num_heads
        xr = x_res.reshape(B, L, H, C // H).transpose(0, 2, 1, 3)
        xr, new_thw = self.F.attn.pool_q(xr, thw)
        xr = self.F.attn.norm_q(xr)
        x_res = xr.transpose(0, 2, 1, 3).reshape(B, -1, C)

        f_x, new_thw = self.F(x, thw)
        y = x_res + f_x
        y = y + self.G(y)
        return y, y, new_thw  # streams re-split as equal copies


def reversible_sequence(blocks: Sequence[Any], params_list: Sequence[Any],
                        x1: jnp.ndarray, x2: jnp.ndarray, thw):
    """Run a span of same-shape ReversibleBlocks with an O(1)-activation
    custom backward (RevBackProp, MViT.py:394-489).

    blocks: unbound ReversibleBlock modules; params_list: their params.
    """

    template = blocks[0]

    def f_fn(params, a):
        return template.apply({"params": params}, a, thw,
                              method=ReversibleBlock.f_part)

    def g_fn(params, a):
        return template.apply({"params": params}, a,
                              method=ReversibleBlock.g_part)

    @jax.custom_vjp
    def run(params_tuple, x1, x2):
        for p in params_tuple:
            x1 = x1 + f_fn(p, x2)
            x2 = x2 + g_fn(p, x1)
        return x1, x2

    def run_fwd(params_tuple, x1, x2):
        y1, y2 = run(params_tuple, x1, x2)
        return (y1, y2), (params_tuple, y1, y2)

    def run_bwd(res, cot):
        params_tuple, y1, y2 = res
        dy1, dy2 = cot
        dparams = []
        for p in reversed(params_tuple):
            # invert: x2 = y2 - G(y1); x1 = y1 - F(x2)
            g_y1, g_vjp = jax.vjp(g_fn, p, y1)
            x2 = y2 - g_y1
            dg_p, dg_y1 = g_vjp(dy2)
            dy1 = dy1 + dg_y1

            f_x2, f_vjp = jax.vjp(f_fn, p, x2)
            x1 = y1 - f_x2
            df_p, df_x2 = f_vjp(dy1)
            dy2 = dy2 + df_x2

            dparams.append(jax.tree.map(jnp.add, dg_p, df_p))
            y1, y2 = x1, x2
        return tuple(reversed(dparams)), dy1, dy2

    run.defvjp(run_fwd, run_bwd)
    return run(tuple(params_list), x1, x2)


class ReversibleMViTFeatures(nn.Module):
    """Reversible MViTv2-S encoder: the MViTFeatures schedule with
    ReversibleBlocks between transitions; final fused stream returned as the
    single output (the reference classifier path, MViT.py:1993-2006).

    For O(1)-activation training of the reversible spans, apply
    `reversible_sequence` to the span's unbound blocks/params (tested in
    tests/test_reversible.py); the plain forward here is numerically
    identical.
    """

    cfg: MViTConfig

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
        kernel = tuple(c.pool_kvq_kernel)
        stride_kv = []
        _skv = list(c.pool_kv_stride_adaptive)
        for i in range(depth):
            _skv = [max(_skv[d] // stride_q[i][d], 1) for d in range(3)]
            stride_kv.append(tuple(_skv))

        input_size = [16 // c.patch_stride[0], 224 // c.patch_stride[1],
                      224 // c.patch_stride[2]]
        embed_dim = c.embed_dim
        num_heads = c.num_heads
        blocks = []
        kinds = []
        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            dim_out = round_width(embed_dim, dim_mul[i],
                                  divisor=round_width(num_heads, head_mul[i]))
            is_transition = (dim_out != embed_dim) or math.prod(stride_q[i]) > 1
            if is_transition:
                blocks.append(StageTransitionBlock(
                    embed_dim, dim_out, tuple(input_size), num_heads,
                    c.mlp_ratio, c.qkv_bias, kernel, kernel,
                    tuple(stride_q[i]), stride_kv[i]))
                kinds.append("transition")
            else:
                blocks.append(ReversibleBlock(
                    embed_dim, tuple(input_size), num_heads, c.mlp_ratio,
                    c.qkv_bias, kernel, kernel, stride_kv[i]))
                kinds.append("rev")
            if math.prod(stride_q[i]) > 1:
                input_size = [s // st for s, st in zip(input_size, stride_q[i])]
            embed_dim = dim_out
        self.blocks = ModuleList(blocks)
        self.kinds = tuple(kinds)
        self.patch_embed = PatchEmbedMViT(c.patch_kernel, c.patch_stride,
                                          c.patch_padding, c.embed_dim)
        self.norm = layernorm(epsilon=1e-6)

    def __call__(self, clips: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x, thw = self.patch_embed(clips)
        x1 = x
        x2 = x  # stream duplication (torch.cat([x, x], -1) split into halves)
        for blk, kind in zip(self.blocks.layers, self.kinds):
            if kind == "transition":
                x1, x2, thw = blk(x1, x2, thw)
            else:
                x1, x2 = blk(x1, x2, thw)
        # RESPATH_FUSE 'concat' + mean-pool + norm (MViT.py:1993-2006)
        fused = jnp.concatenate([x1, x2], axis=-1)
        return self.norm(fused.mean(axis=1))
