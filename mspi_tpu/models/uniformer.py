"""UniFormer-B video backbone: conv-attention hybrid.

Reference: /root/reference/backbones/uniformer.py
(uniformer_b16x4_k400.yaml: dims (64,128,320,512), depths (5,8,20,7),
head_dim 64, joint space-time SABlocks, SPLIT=False, STD=False).

Stages 1-2 are CBlocks (depthwise-conv "attention": 1x1x1 -> 5x5x5 DW ->
1x1x1 with BN3d norms); stages 3-4 are SABlocks (depthwise pos-embed conv +
global joint MHSA over T*H*W tokens with LayerNorm(1e-6)).  Pyramid at
strides 4/8/16/32, T=8 for a 16-frame clip.

The stage-3 attention runs over up to 8*14*24 = 2688 tokens at 224x384 —
one big MXU-friendly batched matmul under XLA.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import UniFormerConfig
from mspi_tpu.ops import (DropPath, Sequential, batchnorm, conv3d, dense, stem_conv3d,
                          dense_split, gelu, layernorm)


class Mlp(nn.Module):
    dim: int
    hidden: int

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden)
        self.fc2 = dense(self.hidden, self.dim)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class CMlp(nn.Module):
    """1x1x1-conv MLP (uniformer.py:99-115)."""

    dim: int
    hidden: int

    def setup(self):
        self.fc1 = conv3d(self.dim, self.hidden, 1)
        self.fc2 = conv3d(self.hidden, self.dim, 1)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class Attention(nn.Module):
    """Joint space-time MHSA (uniformer.py:71-96). x: [B,N,C]."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    # SplitSABlock's t_attn init quirk (uniformer.py:384-394): qkv filled
    # with 0 and proj weight with 1 "to improve training dynamics".
    temporal_init: bool = False

    def setup(self):
        if self.temporal_init:
            z, o = jax.nn.initializers.zeros, jax.nn.initializers.ones
            self.qkv = dense_split(self.dim, self.dim * 3, (self.dim,),
                                   bias=self.qkv_bias, kernel_init=z,
                                   bias_init=z)
            self.proj = dense(self.dim, self.dim, kernel_init=o, bias_init=z)
        else:
            self.qkv = dense_split(self.dim, self.dim * 3, (self.dim,),
                                   bias=self.qkv_bias)
            self.proj = dense(self.dim, self.dim)

    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        head = C // H
        qp, kvp = self.qkv(x)  # [B,N,C], [B,N,2C] — head-major lanes

        from mspi_tpu.ops.pallas import pallas_enabled

        # Fused Pallas attention on the packed activations: at stage 3
        # (N=2688, head_dim 64) K/V fit VMEM, and XLA would otherwise
        # round-trip [B,H,N,N] (~29 MB per head-batch) through HBM.
        if pallas_enabled() and N <= 4096:
            from mspi_tpu.ops.pallas import pallas_interpret
            from mspi_tpu.ops.pallas.pooled_attention import \
                fused_self_attention

            out = fused_self_attention(qp, kvp, num_heads=H,
                                       interpret=pallas_interpret())
            return self.proj(out)

        q = qp.reshape(B, N, H, head)
        k = kvp[:, :, :C].reshape(B, N, H, head)
        v = kvp[:, :, C:].reshape(B, N, H, head)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (head ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        return self.proj(out)


class CBlock(nn.Module):
    """Conv block (uniformer.py:118-137): depthwise pos conv + BN-normed
    depthwise 5x5x5 'attention' + CMlp."""

    dim: int
    drop_path: float = 0.0

    def setup(self):
        d = self.dim
        self.pos_embed = conv3d(d, d, 3, 1, 1, groups=d)
        self.norm1 = batchnorm()
        self.conv1 = conv3d(d, d, 1)
        self.conv2 = conv3d(d, d, 1)
        self.attn = conv3d(d, d, 5, 1, 2, groups=d)
        self.norm2 = batchnorm()
        self.mlp = CMlp(d, int(d * 4))
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, train: bool = False):
        det = not train
        ra = not train
        x = x + self.pos_embed(x)
        x = x + self.dp(self.conv2(self.attn(self.conv1(
            self.norm1(x, use_running_average=ra)))), deterministic=det)
        x = x + self.dp(self.mlp(self.norm2(x, use_running_average=ra)),
                        deterministic=det)
        return x


class SABlock(nn.Module):
    """Global joint space-time attention block (uniformer.py:140-163)."""

    dim: int
    num_heads: int
    drop_path: float = 0.0

    def setup(self):
        d = self.dim
        self.pos_embed = conv3d(d, d, 3, 1, 1, groups=d)
        self.norm1 = layernorm(epsilon=1e-6)
        self.attn = Attention(d, self.num_heads)
        self.norm2 = layernorm(epsilon=1e-6)
        self.mlp = Mlp(d, int(d * 4))
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, train: bool = False):
        det = not train
        x = x + self.pos_embed(x)
        B, T, H, W, C = x.shape
        t = x.reshape(B, T * H * W, C)
        t = t + self.dp(self.attn(self.norm1(t)), deterministic=det)
        from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_mlp

        y = maybe_fused_ln_mlp(self.norm2, self.mlp, t, deterministic=det)
        if y is None:
            y = self.mlp(self.norm2(t))
        t = t + self.dp(y, deterministic=det)
        return t.reshape(B, T, H, W, C)


class SplitSABlock(nn.Module):
    """Divided space-time attention block (uniformer.py:166-201, SPLIT=True):
    temporal attention over T per spatial location feeds — through norm1
    only, the residual stream restarts from x, exactly as the torch forward
    does — a spatial attention per frame, then the joint MLP."""

    dim: int
    num_heads: int
    drop_path: float = 0.0

    def setup(self):
        d = self.dim
        self.pos_embed = conv3d(d, d, 3, 1, 1, groups=d)
        self.t_norm = layernorm(epsilon=1e-6)
        self.t_attn = Attention(d, self.num_heads, temporal_init=True)
        self.norm1 = layernorm(epsilon=1e-6)
        self.attn = Attention(d, self.num_heads)
        self.norm2 = layernorm(epsilon=1e-6)
        self.mlp = Mlp(d, int(d * 4))
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, train: bool = False):
        det = not train
        x = x + self.pos_embed(x)
        B, T, H, W, C = x.shape
        # temporal attention: tokens [B*H*W, T, C]
        t = x.transpose(0, 2, 3, 1, 4).reshape(B * H * W, T, C)
        t = t + self.dp(self.t_attn(self.t_norm(t)), deterministic=det)
        # spatial attention: [B*T, H*W, C]; residual restarts from x
        s = t.reshape(B, H * W, T, C).transpose(0, 2, 1, 3).reshape(B * T, H * W, C)
        residual = x.reshape(B, T, H * W, C).reshape(B * T, H * W, C)
        s = residual + self.dp(self.attn(self.norm1(s)), deterministic=det)
        out = s.reshape(B, T * H * W, C)
        out = out + self.dp(self.mlp(self.norm2(out)), deterministic=det)
        return out.reshape(B, T, H, W, C)


class SABlockScan(nn.Module):
    """SABlock body for nn.scan: identical math to SABlock but the drop-path
    rate arrives as a scanned per-block input (functional drop path)."""

    dim: int
    num_heads: int

    def setup(self):
        d = self.dim
        self.pos_embed = conv3d(d, d, 3, 1, 1, groups=d)
        self.norm1 = layernorm(epsilon=1e-6)
        self.attn = Attention(d, self.num_heads)
        self.norm2 = layernorm(epsilon=1e-6)
        self.mlp = Mlp(d, int(d * 4))

    def __call__(self, x, rate, train: bool = False):
        from mspi_tpu.ops.layers import drop_path_fn

        det = not train
        rng1 = rng2 = None
        if not det:
            rng1 = self.make_rng("dropout")
            rng2 = self.make_rng("dropout")
        x = x + self.pos_embed(x)
        B, T, H, W, C = x.shape
        t = x.reshape(B, T * H * W, C)
        a = self.attn(self.norm1(t))
        t = t + (a if det else drop_path_fn(rng1, a, rate, det))
        m = self.mlp(self.norm2(t))
        t = t + (m if det else drop_path_fn(rng2, m, rate, det))
        return t.reshape(B, T, H, W, C), None


class ScannedSABlocks(nn.Module):
    """nn.scan over `count` identical SABlocks: one traced block instead of
    `count` copies in the HLO — a large compile-time/program-size win for the
    20-block stage (params gain a leading [count] axis; the converter stacks
    the torch per-block weights, see mspi_tpu.convert.stack_blocks)."""

    dim: int
    num_heads: int
    count: int
    rates: Sequence[float]

    @nn.compact
    def __call__(self, x, train: bool = False):
        scan = nn.scan(
            SABlockScan,
            variable_axes={"params": 0},
            split_rngs={"dropout": True, "params": True},
            in_axes=(0, nn.broadcast),
            length=self.count,
        )
        rates = jnp.asarray(list(self.rates), jnp.float32)
        y, _ = scan(dim=self.dim, num_heads=self.num_heads,
                    name="scanned")(x, rates, train)
        return y


class SpecialPatchEmbed(nn.Module):
    """Stem (uniformer.py:204-229, sic 'SpeicalPatchEmbed'): (3,4,4)/s(2,4,4)
    p(1,0,0) conv, then LayerNorm over channels."""

    in_dim: int
    embed_dim: int

    def setup(self):
        self.norm = layernorm()
        self.proj = stem_conv3d(self.in_dim, self.embed_dim, (3, 4, 4),
                                (2, 4, 4), (1, 0, 0))

    def __call__(self, x):
        return self.norm(self.proj(x))


class PatchEmbed(nn.Module):
    """Stage transition (uniformer.py:232-260, STD=False): (1,2,2)/s(1,2,2)
    conv + LayerNorm."""

    in_dim: int
    embed_dim: int

    def setup(self):
        self.norm = layernorm()
        self.proj = conv3d(self.in_dim, self.embed_dim, (1, 2, 2), (1, 2, 2), 0)

    def __call__(self, x):
        return self.norm(self.proj(x))


class UniFormerFeatures(nn.Module):
    """[B,16,H,W,3] -> 4-level pyramid (64,128,320,512), T=8.

    scan_stage3 folds the 20 identical stage-3 SABlocks into one nn.scan
    (same math; params stacked [20, ...]; torch weights stack via
    mspi_tpu.convert.stack_blocks)."""

    cfg: UniFormerConfig
    scan_stage3: bool = False

    def setup(self):
        c = self.cfg
        dims, depths = c.embed_dim, c.depth
        heads = [d // c.head_dim for d in dims]
        total = sum(depths)
        dpr = [0.1 * i / (total - 1) for i in range(total)]

        self.patch_embed1 = SpecialPatchEmbed(3, dims[0])
        self.patch_embed2 = PatchEmbed(dims[0], dims[1])
        self.patch_embed3 = PatchEmbed(dims[1], dims[2])
        self.patch_embed4 = PatchEmbed(dims[2], dims[3])

        off = 0
        self.blocks1 = Sequential([CBlock(dims[0], dpr[off + i]) for i in range(depths[0])])
        off += depths[0]
        self.blocks2 = Sequential([CBlock(dims[1], dpr[off + i]) for i in range(depths[1])])
        off += depths[1]
        sa = SplitSABlock if self.cfg.split else SABlock
        if self.scan_stage3 and not self.cfg.split:
            self.blocks3 = ScannedSABlocks(dims[2], heads[2], depths[2],
                                           tuple(dpr[off + i] for i in range(depths[2])))
        else:
            self.blocks3 = Sequential([sa(dims[2], heads[2], dpr[off + i])
                                       for i in range(depths[2])])
        off += depths[2]
        self.blocks4 = Sequential([sa(dims[3], heads[3], dpr[off + i])
                                   for i in range(depths[3])])

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        feas = []
        x = self.blocks1(self.patch_embed1(x), train=train)
        feas.append(x)
        x = self.blocks2(self.patch_embed2(x), train=train)
        feas.append(x)
        x = self.blocks3(self.patch_embed3(x), train=train)
        feas.append(x)
        x = self.blocks4(self.patch_embed4(x), train=train)
        feas.append(x)
        return feas
