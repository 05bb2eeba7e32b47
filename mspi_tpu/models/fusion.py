"""The MSPI fusion model: cross-modal transformer + FPN decoder + readout.

Reference: /root/reference/model/model_utils.py —
`AudioVisualSaliencyModel` (:388-574) and `VisualSaliencyModel` (:576-702),
with their building blocks `SyncBlock` (:223-282), ViT `Block/Attention/Mlp`
(:32-152), `SA` (:155-170), `Inception` (:173-199), `Adapter` (:202-220),
`ConvNextBlock`/`LayerNorm3d` (:293-354), `StaticSaliencyModelConvNext`
(:357-385) and the SimSiam loss `D` (:285-290).

Everything is channels-last ([B,T,H,W,C] video, [B,F,T,C] audio) and fully
jittable; the whole forward — image prior, audio encoder, video backbone,
cross-modal attention, decoder — is one XLA program.  Module scopes mirror
the torch names so released checkpoints convert mechanically.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mspi_tpu.config import MSPIConfig
from mspi_tpu.models.audio_resnet import AudioResNet18
from mspi_tpu.models.convnext import ConvNeXtTinyFeatures
from mspi_tpu.models.s3d import BasicConv3d, SepConv3d
from mspi_tpu.ops import (
    MapConv3d,
    MaxPool,
    ReLU,
    Sequential,
    Sigmoid,
    Upsample,
    adaptive_avg_pool,
    batchnorm,
    conv2d,
    conv3d,
    conv3d_tapgrad,
    dense_split,
    dense,
    gelu,
    layernorm,
    max_pool,
    pconv3d,
    TemporalDWConv,
    trunc_normal_init,
)

xavier = jax.nn.initializers.xavier_uniform()
zeros = jax.nn.initializers.zeros


def sinusoid_encoding_table(n_position: int, d_hid: int) -> np.ndarray:
    """Fixed sin-cos position table (model_utils.py:18-29). Returned as a
    constant [1, n_position, d_hid] — the reference keeps it as a plain
    (non-checkpointed) tensor attribute, so it is *not* a parameter here
    either."""
    position = np.arange(n_position)[:, None]
    hid = np.arange(d_hid)[None, :]
    angle = position / np.power(10000, 2 * (hid // 2) / d_hid)
    table = np.zeros_like(angle)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table[None].astype(np.float32)


class Mlp(nn.Module):
    """ViT MLP (fc1 -> GELU -> fc2)."""

    dim: int
    hidden: int

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden, kernel_init=xavier, bias_init=zeros)
        self.fc2 = dense(self.hidden, self.dim, kernel_init=xavier, bias_init=zeros)

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


class Attention(nn.Module):
    """Standard multi-head self-attention (model_utils.py:84-109).

    One fused qkv matmul; heads are exposed on their own axis so a tensor-
    parallel mesh can shard them (see mspi_tpu/parallel).
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = False

    def setup(self):
        self.qkv = dense_split(self.dim, self.dim * 3, (self.dim,),
                               bias=self.qkv_bias, kernel_init=xavier,
                               bias_init=zeros)
        self.proj = dense(self.dim, self.dim, kernel_init=xavier, bias_init=zeros)

    def __call__(self, x):
        B, N, C = x.shape
        H = self.num_heads
        head = C // H
        qp, kvp = self.qkv(x)  # [B,N,C], [B,N,2C] — head-major lanes

        from mspi_tpu.ops.pallas import pallas_enabled

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


class Block(nn.Module):
    """Pre-norm ViT block (model_utils.py:122-152; LayerScale off,
    drop-path 0 as in the reference SyncBlock config)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0

    def setup(self):
        self.norm1 = layernorm()
        self.attn = Attention(self.dim, self.num_heads)
        self.norm2 = layernorm()
        self.mlp = Mlp(self.dim, int(self.dim * self.mlp_ratio))

    def __call__(self, x, train: bool = False):
        from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_mlp

        x = x + self.attn(self.norm1(x))
        # deterministic gates the inference-only paths (int8 via
        # MSPI_QUANT=int8, and the fwd-only VMEM budget for the 512x2048
        # MLP whose backward accumulators would not fit)
        y = maybe_fused_ln_mlp(self.norm2, self.mlp, x,
                               deterministic=not train)
        x = x + (y if y is not None else self.mlp(self.norm2(x)))
        return x


class SyncBlock(nn.Module):
    """Cross-modal fusion: project+norm both token streams, add fixed
    sinusoid positions, run 3 joint ViT blocks over the concatenation
    (model_utils.py:223-282)."""

    num_blocks: int = 3
    num_vis_tokens: int = 336
    num_aud_tokens: int = 36
    vis_in_embed: int = 1024
    embed_dim: int = 512

    def setup(self):
        self.vis_proj = dense(self.vis_in_embed, 512, kernel_init=xavier, bias_init=zeros)
        self.vis_norm = layernorm()
        self.aud_norm = layernorm()
        self.blocks = Sequential([
            Block(dim=self.embed_dim, num_heads=4) for _ in range(self.num_blocks)
        ])
        self.vis_pos_embed = jnp.asarray(sinusoid_encoding_table(self.num_vis_tokens, 512))
        self.aud_pos_embed = jnp.asarray(sinusoid_encoding_table(self.num_aud_tokens, 512))

    def __call__(self, vis_fea: jnp.ndarray, aud_fea: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        # vis_fea: [B,t,h,w,C]; aud_fea: [B,ha,wa,512] (channels-last)
        B = vis_fea.shape[0]
        vis = vis_fea.reshape(B, -1, vis_fea.shape[-1])
        aud = aud_fea.reshape(B, -1, aud_fea.shape[-1])
        vis = self.vis_norm(self.vis_proj(vis))
        aud = self.aud_norm(aud)
        vis = vis + jax.lax.stop_gradient(self.vis_pos_embed.astype(vis.dtype))
        aud = aud + jax.lax.stop_gradient(self.aud_pos_embed.astype(aud.dtype))
        feas = jnp.concatenate([vis, aud], axis=1)
        return self.blocks(feas, train=train)


def simsiam_d(p: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """D(p, z) = -mean cos(p, stop_grad(z)) (model_utils.py:285-290)."""
    z = jax.lax.stop_gradient(z)
    # torch cosine_similarity clamps each norm at eps=1e-8
    pn = jnp.maximum(jnp.linalg.norm(p, axis=-1), 1e-8)
    zn = jnp.maximum(jnp.linalg.norm(z, axis=-1), 1e-8)
    return -jnp.mean(jnp.sum(p * z, axis=-1) / (pn * zn))


class LayerNorm3d(nn.Module):
    """LayerNorm over channels of a 5-D map. Channels-last makes the torch
    permute dance (model_utils.py:293-303) a no-op."""

    dim: int

    def setup(self):
        self.norm = layernorm()

    def __call__(self, x):
        return self.norm(x)


class ConvNextBlock3d(nn.Module):
    """Factorised 3-D ConvNeXt block: depthwise (7,1,1) then (1,7,7), LN,
    1x1x1 MLP with GELU, residual (model_utils.py:306-354; class name there
    is ConvNextBlock)."""

    dim: int

    def setup(self):
        ti = trunc_normal_init(0.02)
        # conv3d(dim, dim, (7,1,1), p(3,0,0), groups=dim); the stencil
        # form is a measured flagship NULL, opt-in via MSPI_TDW_STENCIL
        self.dwconv_t = TemporalDWConv(self.dim, 7, kernel_init=ti,
                                       bias_init=zeros)
        # depthwise stays on nn.Conv autodiff: the tap-grad form's 49
        # slice-multiply-reduce taps re-read the full stream per tap
        # (measured ~7.3 ms/step vs XLA's ~1.1 — r4 profile); only DENSE
        # convs win from tap matmuls
        self.dwconv_s = conv3d(self.dim, self.dim, (1, 7, 7), padding=(0, 3, 3),
                               groups=self.dim, kernel_init=ti, bias_init=zeros)
        self.norm = LayerNorm3d(self.dim)
        # 1x1x1 convs as token matmuls (identical param tree): XLA's conv
        # emitter runs these ~12x off the matmul roofline on the decoder's
        # small-T 5-D tensors (r3 HLO: pwconv2 estimated 3.19 ms at
        # [8,4,56,96,192])
        self.pwconv1 = pconv3d(self.dim, 4 * self.dim, kernel_init=ti,
                               bias_init=zeros)
        self.pwconv2 = pconv3d(4 * self.dim, self.dim, kernel_init=ti,
                               bias_init=zeros)

    def __call__(self, x, train: bool = False):
        inp = x
        x = self.dwconv_s(self.dwconv_t(x))
        from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_mlp_pw

        # LN + pwconv1 + GELU + pwconv2 in one Pallas kernel: keeps the 4x
        # hidden in VMEM and skips the unfused LN stat reductions
        y = maybe_fused_ln_mlp_pw(self.norm.norm, self.pwconv1, self.pwconv2,
                                  x, deterministic=not train)
        if y is None:
            y = self.pwconv2(gelu(self.pwconv1(self.norm(x))))
        return inp + y


class SA(nn.Module):
    """Saliency-prior gating: mask conv -> sigmoid -> x*mask + x
    (model_utils.py:155-170)."""

    in_embed_dim: int = 512
    k: int = 2

    def setup(self):
        d = self.in_embed_dim
        self.conv_mask = Sequential([
            BasicConv3d(d, d // 16, 3, 1, 1),
            Upsample((1, self.k, self.k)),
            conv3d(d // 16, 1, (1, 3, 3), padding=(0, 1, 1)),
            Sigmoid(),
        ])

    def __call__(self, x, mask, train: bool = False):
        m = self.conv_mask(mask, train=train)
        return x * m + x


class Inception(nn.Module):
    """3-D Inception block over the fused image-prior features
    (model_utils.py:173-199): 192 + 208 + 48 + 64 = 512 channels out."""

    embed_dim: int = 416

    def setup(self):
        d = self.embed_dim
        self.branch0 = Sequential([BasicConv3d(d, 192, 1, 1)])
        self.branch1 = Sequential([BasicConv3d(d, 96, 1, 1), SepConv3d(96, 208, 3, 1, 1)])
        self.branch2 = Sequential([BasicConv3d(d, 16, 1, 1), SepConv3d(16, 48, 3, 1, 1)])
        self.branch3 = Sequential([MaxPool((3, 3, 3), 1, 1), BasicConv3d(d, 64, 1, 1)])

    def __call__(self, x, train: bool = False):
        return jnp.concatenate(
            [self.branch0(x, train=train), self.branch1(x, train=train),
             self.branch2(x, train=train), self.branch3(x, train=train)],
            axis=-1,
        )


class Adapter(nn.Module):
    """Turns per-frame ConvNeXt features into a 3-D mask volume
    (model_utils.py:202-220): temporal max-pool to T/stride frames, upsample
    the 1/32 map to 1/16, concat (96+320=416 ch), Inception -> 512 ch."""

    embed_dim: int = 416
    num_frames: int = 16
    stride: int = 4

    def setup(self):
        self.conv = Inception(embed_dim=self.embed_dim)
        self.up = Upsample((1, 2, 2))

    def __call__(self, feats: Tuple[jnp.ndarray, jnp.ndarray], train: bool = False):
        o3, o2 = feats  # [(b t), h, w, c] each; o3 at 1/16 (96ch), o2 at 1/32 (320ch)
        t = self.num_frames

        def to_video(o):
            bt, h, w, c = o.shape
            return o.reshape(bt // t, t, h, w, c)

        o3 = max_pool(to_video(o3), (self.stride, 1, 1), (self.stride, 1, 1))
        o2 = max_pool(to_video(o2), (self.stride, 1, 1), (self.stride, 1, 1))
        x = jnp.concatenate([o3, self.up(o2)], axis=-1)
        return self.conv(x, train=train)


class StaticSaliencyModelConvNext(nn.Module):
    """Frozen ConvNeXt-T image-saliency encoder + smooth heads
    (model_utils.py:357-385): returns (96ch @ 1/16, 320ch @ 1/32)."""

    def setup(self):
        self.encoder = ConvNeXtTinyFeatures()
        self.smooth_0 = Sequential([
            conv2d(768, 320, 3, 1, 1), batchnorm(), ReLU(),
        ])
        self.smooth_1 = Sequential([
            conv2d(384, 96, 3, 1, 1), batchnorm(), ReLU(),
        ])

    def __call__(self, x, train: bool = False):
        o3, o2, o1, o0 = self.encoder(x)
        o0 = self.smooth_0(o0, train=train)
        o1 = self.smooth_1(o1, train=train)
        return o1, o0


def _projector(in_dim: int, hidden: int) -> Sequential:
    """3-layer SimSiam projector (model_utils.py:404-413)."""
    return Sequential([
        dense(in_dim, hidden), layernorm(), ReLU(),
        dense(hidden, hidden), layernorm(), ReLU(),
        dense(hidden, hidden), layernorm(),
    ])


def _predictor(hidden: int) -> Sequential:
    """2-layer SimSiam predictor (model_utils.py:414-419)."""
    return Sequential([
        dense(hidden, 512), layernorm(), ReLU(),
        dense(512, hidden),
    ])


def _latlayer(in_dim: int, de_dim: int, temporal: bool, stride: int) -> Sequential:
    """Lateral decoder layer (model_utils.py:437-484): 1x1x1 embed, optional
    temporal-stride conv, factorised ConvNeXt block."""
    layers = [pconv3d(in_dim, de_dim)]
    if temporal:
        layers.append(conv3d_tapgrad(de_dim, de_dim, (stride, 1, 1), (stride, 1, 1), bias=False))
    layers.append(ConvNextBlock3d(de_dim))
    return Sequential(layers)


def _readout(de_dim: int) -> Sequential:
    """Readout head (model_utils.py:490-504): collapse 4x de_dim pyramid to a
    1-channel map at full resolution and T=1.

    Two exact TPU rewrites vs the reference order (child indices — and thus
    converter names — are unchanged):
    - the stride-4 temporal-collapse conv (idx 8) runs BEFORE the (1,4,4)
      spatial Upsample (idx 7): both are linear over disjoint axes, so the
      composition is identical, but the conv now reads 56x96 instead of
      224x384 (the old order materialised a 352 MB intermediate whose
      relayout copy alone was 5 ms/trace — r3 profile copy.3439).
    - the final 32->1 conv is a MapConv3d emitting [B,T,H,W] directly
      (see its docstring; identical params)."""
    return Sequential([
        pconv3d(de_dim * 4, de_dim),
        conv3d_tapgrad(de_dim, de_dim, 3, 1, 1),
        batchnorm(), ReLU(),
        conv3d_tapgrad(de_dim, 64, (1, 3, 3), 1, (0, 1, 1)),
        batchnorm(), ReLU(),
        Upsample((1, 4, 4)),
        conv3d_tapgrad(64, 32, (4, 1, 1), (4, 1, 1), 0),
        ReLU(),
        conv3d_tapgrad(32, 32, (1, 3, 3), 1, (0, 1, 1)),
        ReLU(),
        MapConv3d(32, (3, 3)),
    ], order=(0, 1, 2, 3, 4, 5, 6, 8, 7, 9, 10, 11, 12))


class AudioVisualSaliencyModel(nn.Module):
    """The full MSPI net (model_utils.py:388-574).

    __call__(clips [B,T,H,W,3], audios [B,F,Tw,1], train) ->
        (log-saliency map [B,H,W], SimSiam AV loss scalar).
    """

    cfg: MSPIConfig

    def setup(self):
        mc = self.cfg.model
        vis_embed_dims = mc.embed_dims
        aud_embed_dim = mc.aud_embed_dim
        de = mc.de_embed_dim
        hidden = mc.simsiam_hidden

        self.audnet = AudioResNet18()
        self.image_encoder = StaticSaliencyModelConvNext()
        from mspi_tpu.models.registry import build_backbone

        self.visnet = build_backbone(self.cfg)
        self.aud_vis_sync_block = SyncBlock(
            num_blocks=mc.sync_num_blocks,
            num_vis_tokens=self.cfg.num_vis_tokens(),
            vis_in_embed=vis_embed_dims[-1],
            embed_dim=aud_embed_dim,
        )
        self.vis_projector = _projector(aud_embed_dim, hidden)
        self.mlp_vis = _predictor(hidden)
        self.aud_projector = _projector(aud_embed_dim, hidden)
        self.mlp_aud = _predictor(hidden)

        lb, ls = mc.lateral_bool, mc.lateral_stride
        self.latlayer_0 = _latlayer(vis_embed_dims[0], de, lb[0], ls[0])
        self.latlayer_1 = _latlayer(vis_embed_dims[1], de, lb[1], ls[1])
        self.latlayer_2 = _latlayer(vis_embed_dims[2], de, lb[2], ls[2])
        self.latlayer_3 = _latlayer(vis_embed_dims[3] + aud_embed_dim, de, lb[3], ls[3])

        self.upsample = Upsample((1, 2, 2))
        self.upsample_4 = Upsample((1, 4, 4))
        self.upsample_8 = Upsample((1, 8, 8))
        self.readout = _readout(de)

        self.adapter = Adapter(num_frames=self.cfg.data.num_frames,
                               stride=self.cfg.data.num_frames // 4)
        self.sa_0 = SA(512, k=4)
        self.sa_1 = SA(512, k=2)
        self.sa_2 = SA(512, k=1)

    def forward_encoder(self, clips, audios, train: bool = False):
        # Frozen audio encoder: always running-stats BN (model_utils.py:516-518).
        aud_features = self.audnet(audios, train=False)
        v1, v2, v3, v4 = self.visnet(clips, train=train)

        B, t, h, w, _ = v4.shape
        ha = aud_features.shape[1]
        x = self.aud_vis_sync_block(v4, aud_features, train=train)
        n_vis = t * h * w
        vis_fea = x[:, :n_vis, :].reshape(B, t, h, w, -1)
        aud_fea = x[:, n_vis:, :].reshape(B, ha, -1, x.shape[-1])

        vis_emb = self.vis_projector(adaptive_avg_pool(vis_fea, 3).reshape(B, -1))
        aud_emb = self.aud_projector(adaptive_avg_pool(aud_fea, 2).reshape(B, -1))
        vis_pred = self.mlp_vis(vis_emb)
        aud_pred = self.mlp_aud(aud_emb)
        loss_va = (simsiam_d(vis_pred, aud_emb) + simsiam_d(aud_pred, vis_emb)) * 0.5
        return v1, v2, v3, v4, vis_fea, loss_va

    def __call__(self, clips, audios, train: bool = False):
        B, T, H, W, C = clips.shape
        frames = clips.reshape(B * T, H, W, C)
        # Frozen image encoder (always eval-mode BN).
        masks = self.adapter(self.image_encoder(frames, train=False), train=train)

        v1, v2, v3, v4, vis_sync, loss_av = self.forward_encoder(clips, audios, train)
        v4 = jnp.concatenate([v4, vis_sync], axis=-1)

        s3 = self.latlayer_3(v4, train=train)
        s0 = self.latlayer_0(v1, train=train)
        s1 = self.latlayer_1(v2, train=train)
        s2 = self.latlayer_2(v3, train=train)

        s2 = self.sa_2(s2, masks, train=train) + self.upsample(s3)
        s1 = self.sa_1(s1, masks, train=train) + self.upsample(s2) + self.upsample_4(s3)
        s0 = (self.sa_0(s0, masks, train=train) + self.upsample(s1)
              + self.upsample_4(s2) + self.upsample_8(s3))

        out = self.readout(
            jnp.concatenate([s0, self.upsample(s1), self.upsample_4(s2),
                             self.upsample_8(s3)], axis=-1),
            train=train,
        )
        out = out[:, 0].astype(jnp.float32)  # MapConv3d emits [B,T,H,W]
        out = out - jax.scipy.special.logsumexp(out, axis=(1, 2), keepdims=True)
        return out, loss_av


class VisualSaliencyModel(nn.Module):
    """Video-only twin (model_utils.py:576-702): no audnet / SyncBlock /
    SimSiam heads; latlayer_3 consumes v4 alone."""

    cfg: MSPIConfig

    def setup(self):
        mc = self.cfg.model
        vis_embed_dims = mc.embed_dims
        de = mc.de_embed_dim

        self.image_encoder = StaticSaliencyModelConvNext()
        from mspi_tpu.models.registry import build_backbone

        self.visnet = build_backbone(self.cfg)

        lb, ls = mc.lateral_bool, mc.lateral_stride
        self.latlayer_0 = _latlayer(vis_embed_dims[0], de, lb[0], ls[0])
        self.latlayer_1 = _latlayer(vis_embed_dims[1], de, lb[1], ls[1])
        self.latlayer_2 = _latlayer(vis_embed_dims[2], de, lb[2], ls[2])
        self.latlayer_3 = _latlayer(vis_embed_dims[3], de, lb[3], ls[3])

        self.upsample = Upsample((1, 2, 2))
        self.upsample_4 = Upsample((1, 4, 4))
        self.upsample_8 = Upsample((1, 8, 8))
        self.readout = _readout(de)

        self.adapter = Adapter(num_frames=self.cfg.data.num_frames,
                               stride=self.cfg.data.num_frames // 4)
        self.sa_0 = SA(512, k=4)
        self.sa_1 = SA(512, k=2)
        self.sa_2 = SA(512, k=1)

    def __call__(self, clips, train: bool = False):
        B, T, H, W, C = clips.shape
        frames = clips.reshape(B * T, H, W, C)
        masks = self.adapter(self.image_encoder(frames, train=False), train=train)
        v1, v2, v3, v4 = self.visnet(clips, train=train)

        s3 = self.latlayer_3(v4, train=train)
        s0 = self.latlayer_0(v1, train=train)
        s1 = self.latlayer_1(v2, train=train)
        s2 = self.latlayer_2(v3, train=train)

        s2 = self.sa_2(s2, masks, train=train) + self.upsample(s3)
        s1 = self.sa_1(s1, masks, train=train) + self.upsample(s2) + self.upsample_4(s3)
        s0 = (self.sa_0(s0, masks, train=train) + self.upsample(s1)
              + self.upsample_4(s2) + self.upsample_8(s3))

        out = self.readout(
            jnp.concatenate([s0, self.upsample(s1), self.upsample_4(s2),
                             self.upsample_8(s3)], axis=-1),
            train=train,
        )
        out = out[:, 0].astype(jnp.float32)  # MapConv3d emits [B,T,H,W]
        out = out - jax.scipy.special.logsumexp(out, axis=(1, 2), keepdims=True)
        return out, 0.0
