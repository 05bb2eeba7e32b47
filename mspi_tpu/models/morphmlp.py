"""MorphMLP-S video backbone: chunked-FC token mixing, no attention.

Reference: /root/reference/backbones/MorphMLP.py
(`MorphMLP_32_features_only`, K400_MLP_S16x4.yaml: layers (3,4,9,3), dims
(112,224,392,784), segment dims (14,28,28,49), mlp_ratio 3).  Emits the
4-level pyramid at strides 4/8/16/32, T=8 for a 16-frame clip.

This is the most TPU-friendly backbone in the zoo: token mixing is pure
reshaped matmuls (MXU work end-to-end) and the reference itself computes in
[B,T,H,W,C] channels-last — here that layout is native, no permutes at all.

MorphFC semantics (MorphMLP.py:38-159): channels are split into
`segment_dim` segments; along H (resp. W / T) the segment axis is exchanged
with a chunk of the spatial axis so one Linear mixes (chunk x segment)
jointly; a per-channel softmax gate (reweight MLP) blends the h/w/c (or h/c)
branches.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import MorphMLPConfig
from mspi_tpu.ops import (DropPath, Sequential, batchnorm, conv3d, dense,
                          gelu, layernorm, stem_conv3d)


class Mlp(nn.Module):
    dim: int
    hidden: int
    out: int = 0

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden)
        self.fc2 = dense(self.hidden, self.out or self.dim)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class MorphFC_T(nn.Module):
    """Temporal mixing (MorphMLP.py:129-159): segment channels into 8 groups
    and mix (T x C/8) jointly. Requires T == 8 (true after the stride-2
    temporal patch embed of a 16-frame clip)."""

    dim: int

    def setup(self):
        self.mlp_t = dense(self.dim, self.dim)
        self.proj = dense(self.dim, self.dim)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        seg = 8
        S = C // seg
        t = x.reshape(B, T, H, W, seg, S).transpose(0, 4, 2, 3, 1, 5).reshape(B, seg, H, W, T * S)
        t = self.mlp_t(t).reshape(B, seg, H, W, T, S).transpose(0, 4, 2, 3, 1, 5).reshape(B, T, H, W, C)
        return self.proj(t)


def _fold_enabled() -> bool:
    # rides the FLOPs-twin gate like the s2d stems: the folded form adds
    # zero-block FLOPs that bench.py's counting twin must not see
    import os

    # default OFF: measured 58.4 vs 68.0 clips/s control (r4 A/B) — the
    # x-seg zero-block FLOPs cost more than the lane-padded copies they
    # replace at these shapes; kept opt-in as the third recorded lowering
    # attempt (docs/ROOFLINE_MORPHMLP.md)
    return (os.environ.get("MSPI_MORPH_FOLD") == "1"
            and not os.environ.get("MSPI_DISABLE_PALLAS"))


def _chunk_mix(x: jnp.ndarray, mlp, seg: int) -> jnp.ndarray:
    """Shared W-style chunk mixing: [B,T,H,W,C] with chunks of seg spatial
    positions mixed jointly with the channel segments.

    TPU lowering (r4): the reference form needs two 6-D transposes whose
    (seg, seg, S) minor dims are far below the 128-lane tile (S=8 at stage
    1 -> 16x lane-padded copies; the r4 profile put 47% of the morphmlps
    step in copies/reshapes).  Since the mix is linear, it is instead ONE
    block-diagonal dense matmul over the contiguous (p, C) trailing dims:
    Wbig[(p',q,s),(p,q',s')] = K[(p',s),(p,s')] * delta_qq' — exact (zero
    blocks contribute nothing), no transposes at all, x flattens to
    [..., seg*C] as a pure view.  Costs seg-times the FLOPs in clean MXU
    work; gated to seg*C <= 6272 (stages 1-2) so the folded weights stay
    small (stage 3's would be 241 MB).  MSPI_MORPH_FOLD=0 reverts."""
    import os

    B, T, H, W, C = x.shape
    S = C // seg
    if (_fold_enabled() and not mlp.is_initializing() and seg * C <=
            int(os.environ.get("MSPI_MORPH_FOLD_MAXDIM", "6272"))):
        p = mlp.variables["params"]
        K, b = p["kernel"], p["bias"]
        dt = getattr(mlp, "dtype", None) or x.dtype
        K4 = K.reshape(seg, S, seg, S)  # [p', s, p, s']
        eye = jnp.eye(seg, dtype=K.dtype)
        Wbig = jnp.einsum("asbt,uv->ausbvt", K4, eye).reshape(seg * C, seg * C)
        bias_big = jnp.broadcast_to(
            b.reshape(seg, 1, S), (seg, seg, S)).reshape(seg * C)
        x6 = x.reshape(B, T, (H * W) // seg, seg * C).astype(dt)
        y = jnp.dot(x6, Wbig.astype(dt)) + bias_big.astype(dt)
        return y.reshape(B, T, H, W, C)
    y = x.reshape(B, T, H * W // seg, seg, seg, S).transpose(0, 1, 2, 4, 3, 5)
    y = y.reshape(B, T, H * W // seg, seg, seg * S)
    y = mlp(y)
    y = y.reshape(B, T, H * W // seg, seg, seg, S).transpose(0, 1, 2, 4, 3, 5)
    return y.reshape(B, T, H, W, C)


class MorphFC_S(nn.Module):
    """Spatial mixing with 3-way (h/w/c) gated blend (MorphMLP.py:77-126)."""

    dim: int
    segment_dim: int

    def setup(self):
        self.mlp_h = dense(self.dim, self.dim, bias=True)
        self.mlp_w = dense(self.dim, self.dim, bias=True)
        self.mlp_c = dense(self.dim, self.dim, bias=True)
        self.reweight = Mlp(self.dim, self.dim // 4, self.dim * 3)
        self.proj = dense(self.dim, self.dim)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        seg = self.segment_dim
        # H branch operates on the W-transposed tensor (MorphMLP.py:98-106)
        h = jnp.swapaxes(x, 2, 3)
        h = _chunk_mix(h, self.mlp_h, seg)
        h = jnp.swapaxes(h, 2, 3)
        w = _chunk_mix(x, self.mlp_w, seg)
        c = self.mlp_c(x)

        a = jnp.mean(h + w + c, axis=(1, 2, 3))  # [B,C]
        a = self.reweight(a).reshape(B, C, 3).transpose(2, 0, 1)
        a = jax.nn.softmax(a, axis=0)[:, :, None, None, None, :]
        x = h * a[0] + w * a[1] + c * a[2]
        return self.proj(x)


class MorphFC_S2(nn.Module):
    """Stage-4 variant: single chunked branch + channel branch, 2-way gate
    (MorphMLP.py:38-74)."""

    dim: int
    segment_dim: int

    def setup(self):
        self.mlp_c = dense(self.dim, self.dim, bias=True)
        self.mlp_h = dense(self.dim, self.dim, bias=True)
        self.reweight = Mlp(self.dim, self.dim // 4, self.dim * 2)
        self.proj = dense(self.dim, self.dim)

    def __call__(self, x):
        B, T, H, W, C = x.shape
        seg = self.segment_dim
        S = C // seg
        # (MorphMLP.py:56-62): chunk index runs over seg positions, mixed with
        # the segment axis
        h = x.reshape(B, T, seg, H * W // seg, seg, S).transpose(0, 1, 4, 3, 2, 5)
        h = h.reshape(B, T, seg, H * W // seg, seg * S)
        h = self.mlp_h(h)
        h = h.reshape(B, T, seg, H * W // seg, seg, S).transpose(0, 1, 4, 3, 2, 5)
        h = h.reshape(B, T, H, W, C)
        c = self.mlp_c(x)

        a = jnp.mean(h + c, axis=(1, 2, 3))
        a = self.reweight(a).reshape(B, C, 2).transpose(2, 0, 1)
        a = jax.nn.softmax(a, axis=0)[:, :, None, None, None, :]
        x = h * a[0] + c * a[1]
        return self.proj(x)


class PermutatorBlock(nn.Module):
    """t_fc -> spatial fc -> MLP, each pre-normed; note the spatial-fc
    residual bases off the *pre-t_fc* x (MorphMLP.py:180-184)."""

    dim: int
    segment_dim: int
    mlp_ratio: float = 3.0
    drop_path: float = 0.0
    stage4: bool = False

    def setup(self):
        self.norm1 = layernorm()
        self.t_norm1 = layernorm()
        self.t_fc = MorphFC_T(self.dim)
        fc_cls = MorphFC_S2 if self.stage4 else MorphFC_S
        self.fc = fc_cls(self.dim, self.segment_dim)
        self.norm2 = layernorm()
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio))
        self.dp = DropPath(self.drop_path)

    def __call__(self, x, train: bool = False):
        det = not train
        xt = x + self.t_fc(self.t_norm1(x))
        x = x + self.dp(self.fc(self.norm1(xt)), deterministic=det)
        x = x + self.dp(self.mlp(self.norm2(x)), deterministic=det)
        return x


class PatchEmbed(nn.Module):
    """Stem (MorphMLP.py:187-205): (3,3,3)/s(2,2,2) conv + BN + GELU +
    (1,3,3)/s(1,2,2) conv + BN -> T/2, HW/4."""

    embed_dim: int

    def setup(self):
        self.proj1 = stem_conv3d(3, self.embed_dim // 2, (3, 3, 3), (2, 2, 2),
                                 (1, 1, 1))
        self.norm1 = batchnorm()
        self.proj2 = conv3d(self.embed_dim // 2, self.embed_dim, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.norm2 = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = gelu(self.norm1(self.proj1(x), use_running_average=ra))
        return self.norm2(self.proj2(x), use_running_average=ra)


class Downsample(nn.Module):
    """(1,3,3)/s(1,2,2) conv + LayerNorm (MorphMLP.py:208-222)."""

    in_dim: int
    out_dim: int

    def setup(self):
        self.proj = conv3d(self.in_dim, self.out_dim, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        self.norm = layernorm()

    def __call__(self, x):
        return self.norm(self.proj(x))


class MorphMLPFeatures(nn.Module):
    """4-level pyramid extractor (MorphMLP.py:371-508).

    [B,16,H,W,3] -> [(B,8,H/4,W/4,112), (B,8,H/8,W/8,224),
    (B,8,H/16,W/16,392), (B,8,H/32,W/32,784)].
    """

    cfg: MorphMLPConfig

    def setup(self):
        c = self.cfg
        dims, segs, layers = c.embed_dims, c.segment_dim, c.layers
        dpr = [0.1 * i / (sum(layers) - 1) for i in range(sum(layers))]
        self.patch_embed1 = PatchEmbed(dims[0])
        offset = 0
        stages = []
        for si in range(4):
            blocks = [
                PermutatorBlock(dims[si], segs[si], c.mlp_ratios[si],
                                drop_path=dpr[offset + i], stage4=(si == 3))
                for i in range(layers[si])
            ]
            stages.append(Sequential(blocks))
            offset += layers[si]
        self.blocks1, self.blocks2, self.blocks3, self.blocks4 = stages
        self.patch_embed2 = Downsample(dims[0], dims[1])
        self.patch_embed3 = Downsample(dims[1], dims[2])
        self.patch_embed4 = Downsample(dims[2], dims[3])

    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = self.patch_embed1(x, train=train)
        feas = []
        x = self.blocks1(x, train=train)
        feas.append(x)
        x = self.blocks2(self.patch_embed2(x), train=train)
        feas.append(x)
        x = self.blocks3(self.patch_embed3(x), train=train)
        feas.append(x)
        x = self.blocks4(self.patch_embed4(x), train=train)
        feas.append(x)
        return feas
