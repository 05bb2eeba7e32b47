"""SlowFast 4x16 R50 video backbone.

Reference: /root/reference/backbones/sf.py (SLOWFAST_4x16_R50.yaml: alpha 4,
beta_inv 8, fusion ratio 2, fusion kernel 5, R50 bottleneck stages).
The fusion model feeds the slow pathway the 4 frames {0, 4, 12, -1} of the
16-frame clip (model_utils.py:521-524 — note the non-uniform last index);
that wrapping lives here so the fusion model stays backbone-agnostic.

Pyramid = slow+fused features after each stage's fuse
(sf.py:360-385): channels (320, 640, 1280, 2048) at strides 4/8/16/32,
T=4 throughout on the slow path.

The released SLOWFAST_4x16_R50.pkl is a caffe2 pickle; conversion is in
mspi_tpu/convert/caffe2.py.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mspi_tpu.config import SlowFastConfig
from mspi_tpu.models.resnet3d import ResStage, VideoModelStem
from mspi_tpu.ops import batchnorm, conv3d

_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
# "slowfast" temporal kernel basis (sf.py:74-80)
_TEMP_KERNEL = [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]]


# ---------------- T-folded fast pathway (inference) ----------------
#
# The fast pathway's channel widths (8 at the stem, 32/64/128 through
# s2-s4) are far below the 128-lane tile, so every fast-pathway tensor and
# conv pays up to a 16x lane-padding tax (r3 profile: the [8,16,112,192,8]
# stem-output fusion alone is ~10.8 ms/iter, 7.8% of the slowfast step).
# TPU-first fix: at inference, fold T into the channel dim ([B,T,H,W,C] ->
# [B,H,W,T*C]) and lower every fast conv as a 2-D conv over the folded dim
# whose weights are the original kernels placed banded (temporal taps) /
# block-diagonally (per-frame convs) with zeros elsewhere — EXACT math
# (zero taps contribute nothing), full-lane MXU contractions, same param
# tree (folding happens at trace time from the bound variables, so
# checkpoints/converter are untouched).  The extra FLOPs of the zero blocks
# (~16x on paper) are cheap MXU work replacing pathological padded-lane
# fusions.  Gated to inference: folded BN uses running stats as a
# per-(t,c)-tiled affine, which is exact in eval but would change train-mode
# batch-stat shapes.  MSPI_SF_FOLDT=0 disables; =1 forces (CPU parity test).
# Reference pathway being re-laid-out: /root/reference/backbones/sf.py:136-149.


def fold_t_enabled() -> bool:
    env = os.environ.get("MSPI_SF_FOLDT", "")
    if env == "0" or os.environ.get("MSPI_DISABLE_PALLAS"):
        return False
    if env == "1":
        return True
    return jax.default_backend() in ("tpu", "axon")


def _fold_kernel_t(w5: jnp.ndarray, t_in: int, t_stride: int = 1,
                   t_pad: int | None = None) -> jnp.ndarray:
    """[kt,kh,kw,Ci,Co] -> [kh,kw, t_in*Ci, t_out*Co] banded temporal fold
    (t_out = ceil(t_in / t_stride), torch-style padding kt//2 by default).
    Zero rows implement the temporal zero-padding exactly."""
    kt, kh, kw, ci, co = w5.shape
    pad = kt // 2 if t_pad is None else t_pad
    t_out = -(-t_in // t_stride)
    sel = np.zeros((t_in, kt, t_out), np.float32)
    for to in range(t_out):
        for k in range(kt):
            ti = to * t_stride + k - pad
            if 0 <= ti < t_in:
                sel[ti, k, to] = 1.0
    wf = jnp.einsum("tku,khwio->hwtiuo", jnp.asarray(sel, w5.dtype), w5)
    return wf.reshape(kh, kw, t_in * ci, t_out * co)


def _folded_conv(x, w5, t_in, stride_hw=1, pad_hw=0, t_stride=1):
    """2-D conv of the folded stream by the folded kernel."""
    wf = _fold_kernel_t(w5, t_in, t_stride)
    s = (stride_hw, stride_hw) if isinstance(stride_hw, int) else tuple(stride_hw)
    p = (pad_hw, pad_hw) if isinstance(pad_hw, int) else tuple(pad_hw)
    return jax.lax.conv_general_dilated(
        x, wf.astype(x.dtype), window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _folded_fast_stem(stem, clips, dt):
    """The fast ResNetBasicStem ((5,7,7)/s(1,2,2) conv + BN + ReLU +
    1x3x3/s(1,2,2) maxpool) computed entirely in the T-folded layout.

    The 5-D stem's C=8 output at 112x192 was the single biggest op left
    after phase-1 folding (r4 profile: its conv+BN+ReLU fusion alone was
    ~7.7 ms/iter, 16x lane-padded).  Folding T through the stem makes the
    conv a 2-D [7,7, T*3(+T), T*8] banded dense conv — the T fold gives a
    64-deep contraction for free (no s2d needed), the temporal taps are
    banded with zero rows at the clip borders (exact zero-padding), and
    for uint8 input the ImageNet affine folds in with one ones-channel
    PER FRAME (each frame's offset must vanish exactly where that frame
    is out of range — mirroring ops/layers._fold_uint8_affine).
    Output [B, 56, 96, T*8] feeds the folded pipeline directly."""
    w5 = stem.conv.variables["params"]["kernel"]  # [5,7,7,3,8]
    kt, kh, kw, ci, co = w5.shape
    b, t_in, hh, ww, _ = clips.shape
    # fold the clip: [B,T,H,W,3] -> [B,H,W,T*3]
    xf = clips.transpose(0, 2, 3, 1, 4).reshape(b, hh, ww, t_in * ci)
    wf = w5.astype(jnp.float32)
    if clips.dtype == jnp.uint8:
        from mspi_tpu.data.video import IMAGENET_MEAN, IMAGENET_STD

        s = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), jnp.float32)
        o = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, jnp.float32)
        w_rgb = wf * s[:, None]                       # [kt,kh,kw,3,8]
        w_one = jnp.sum(wf * o[:, None], axis=-2)     # [kt,kh,kw,8]
        xf = xf.astype(dt)
        ones = jnp.ones((b, hh, ww, t_in), dt)
        xf = jnp.concatenate([xf, ones], axis=-1)     # [B,H,W,T*3+T]
    else:
        w_rgb, w_one = wf, None
        xf = xf.astype(dt)
    # banded temporal fold: out (t, c) draws frame t' = t + dt - kt//2
    pad = kt // 2
    sel = np.zeros((t_in, kt, t_in), np.float32)
    for to in range(t_in):
        for k in range(kt):
            ti = to + k - pad
            if 0 <= ti < t_in:
                sel[ti, k, to] = 1.0
    selj = jnp.asarray(sel, jnp.float32)
    w_main = jnp.einsum("tku,khwio->hwtiuo", selj, w_rgb).reshape(
        kh, kw, t_in * ci, t_in * co)
    if w_one is not None:
        w_ones = jnp.einsum("tku,khwo->hwtuo", selj, w_one).reshape(
            kh, kw, t_in, t_in * co)
        w_full = jnp.concatenate([w_main, w_ones], axis=2)
    else:
        w_full = w_main
    y = jax.lax.conv_general_dilated(
        xf, w_full.astype(dt), window_strides=(2, 2),
        padding=[(kh // 2, kh // 2), (kw // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = _folded_bn(stem.bn, y, t_in, relu=True)
    # 1x3x3/s(1,2,2) maxpool: spatial-only -> folded 2-D window (-inf pads,
    # matching ops.layers.max_pool)
    y = jax.lax.reduce_window(
        y, jnp.array(-jnp.inf, y.dtype), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return y


def _folded_bn(bn: nn.BatchNorm, x, t: int, relu: bool):
    """Inference BN as a T-tiled per-channel affine from running stats."""
    p = bn.variables["params"]
    s = bn.variables["batch_stats"]
    scale = (p["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(s["var"].astype(jnp.float32) + bn.epsilon))
    bias = p["bias"].astype(jnp.float32) - s["mean"].astype(jnp.float32) * scale
    scale = jnp.tile(scale, t).astype(x.dtype)
    bias = jnp.tile(bias, t).astype(x.dtype)
    y = x * scale + bias
    return jax.nn.relu(y) if relu else y


class FuseFastToSlow(nn.Module):
    """Strided temporal conv on the fast path, concatenated into slow
    (sf.py:101-159)."""

    dim_in: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int

    def setup(self):
        self.conv_f2s = conv3d(self.dim_in, self.dim_in * self.fusion_conv_channel_ratio,
                               (self.fusion_kernel, 1, 1), (self.alpha, 1, 1),
                               (self.fusion_kernel // 2, 0, 0), bias=False)
        self.bn = batchnorm()

    def __call__(self, x, train: bool = False):
        x_s, x_f = x
        fuse = jax.nn.relu(self.bn(self.conv_f2s(x_f), use_running_average=not train))
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


class SlowFastFeatures(nn.Module):
    """__call__(clips [B,16,H,W,3]) -> 4-level slow+fused pyramid."""

    cfg: SlowFastConfig

    def setup(self):
        c = self.cfg
        d2, d3, d4, d5 = _STAGE_DEPTH[c.depth]
        w = c.width_per_group
        dim_inner = c.num_groups * w
        beta = c.beta_inv
        ratio = c.fusion_conv_channel_ratio
        out_dim_ratio = beta // ratio
        tk = _TEMP_KERNEL

        self.s1 = VideoModelStem(
            dim_in=[3, 3], dim_out=[w, w // beta],
            kernel=[tuple(tk[0][0]) + (7, 7), tuple(tk[0][1]) + (7, 7)],
            stride=[(1, 2, 2)] * 2,
            padding=[(tk[0][0][0] // 2, 3, 3), (tk[0][1][0] // 2, 3, 3)],
            stem_func_name="basic_stem")
        self.s1_fuse = FuseFastToSlow(w // beta, ratio, c.fusion_kernel_sz, c.alpha)

        def stage(i, din_s, din_f, dout_s, dout_f, dinner, depth, stride):
            return ResStage(
                dim_in=[din_s, din_f], dim_out=[dout_s, dout_f],
                dim_inner=[dinner, dinner // beta],
                temp_kernel_sizes=tk[i], stride=[stride, stride],
                num_blocks=[depth] * 2, num_groups=[c.num_groups] * 2,
                num_block_temp_kernel=list(c.num_block_temp_kernel[i - 1]),
                trans_func_name="bottleneck_transform")

        self.s2 = stage(1, w + w // out_dim_ratio, w // beta, w * 4, w * 4 // beta,
                        dim_inner, d2, c.spatial_strides[0][0])
        self.s2_fuse = FuseFastToSlow(w * 4 // beta, ratio, c.fusion_kernel_sz, c.alpha)
        self.s3 = stage(2, w * 4 + w * 4 // out_dim_ratio, w * 4 // beta,
                        w * 8, w * 8 // beta, dim_inner * 2, d3, c.spatial_strides[1][0])
        self.s3_fuse = FuseFastToSlow(w * 8 // beta, ratio, c.fusion_kernel_sz, c.alpha)
        self.s4 = stage(3, w * 8 + w * 8 // out_dim_ratio, w * 8 // beta,
                        w * 16, w * 16 // beta, dim_inner * 4, d4, c.spatial_strides[2][0])
        self.s4_fuse = FuseFastToSlow(w * 16 // beta, ratio, c.fusion_kernel_sz, c.alpha)
        self.s5 = stage(4, w * 16 + w * 16 // out_dim_ratio, w * 16 // beta,
                        w * 32, w * 32 // beta, dim_inner * 8, d5, c.spatial_strides[3][0])

    def __call__(self, clips: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        # Two-pathway wrap (model_utils.py:521-524): slow = frames {0,4,12,-1}
        slow = jnp.stack([clips[:, 0], clips[:, 4], clips[:, 12], clips[:, -1]], axis=1)
        x = [slow, clips]
        if (not train and not self.is_initializing() and fold_t_enabled()):
            return self._forward_folded(x)
        x = self.s1_fuse(self.s1(x, train=train), train=train)
        x = self.s2_fuse(self.s2(x, train=train), train=train)
        feas = [x[0]]
        # pathway pools are 1x1x1 (identity) for the slowfast arch (sf.py:90-99)
        x = self.s3_fuse(self.s3(x, train=train), train=train)
        feas.append(x[0])
        x = self.s4_fuse(self.s4(x, train=train), train=train)
        feas.append(x[0])
        x = self.s5(x, train=train)
        feas.append(x[0])
        return feas

    # ---- T-folded fast pathway (see module block comment) ----

    def _folded_fuse(self, fuse: FuseFastToSlow, x_s, x_ff, t: int):
        k = fuse.conv_f2s.variables["params"]["kernel"]  # [kt,1,1,ci,co]
        y = _folded_conv(x_ff, k, t, t_stride=fuse.alpha)
        t_out = -(-t // fuse.alpha)
        y = _folded_bn(fuse.bn, y, t_out, relu=True)
        b, hh, ww, _ = y.shape
        y5 = y.reshape(b, hh, ww, t_out, k.shape[-1]).transpose(0, 3, 1, 2, 4)
        return jnp.concatenate([x_s, y5], axis=-1)

    def _folded_resblock(self, blk, x, t: int):
        tr = blk.branch2  # BottleneckTransform (groups == 1 for slowfast)
        y = _folded_conv(x, tr.a.variables["params"]["kernel"], t)
        y = _folded_bn(tr.a_bn, y, t, relu=True)
        y = _folded_conv(y, tr.b.variables["params"]["kernel"], t,
                         stride_hw=tr.stride, pad_hw=1)
        y = _folded_bn(tr.b_bn, y, t, relu=True)
        y = _folded_conv(y, tr.c.variables["params"]["kernel"], t)
        y = _folded_bn(tr.c_bn, y, t, relu=False)
        if blk.has_branch1:
            sc = _folded_conv(x, blk.branch1.variables["params"]["kernel"], t,
                              stride_hw=blk.stride)
            sc = _folded_bn(blk.branch1_bn, sc, t, relu=False)
        else:
            sc = x
        return jax.nn.relu(sc + y)

    def _stage_split(self, stage: ResStage, x_s, x_ff, t: int):
        # slow pathway exactly as ResStage runs it (slowfast has no
        # non-local blocks; the folded gate asserts that)
        for i in range(stage.num_blocks[0]):
            x_s = getattr(stage, f"pathway0_res{i}")(x_s, train=False)
        for i in range(stage.num_blocks[1]):
            x_ff = self._folded_resblock(
                getattr(stage, f"pathway1_res{i}"), x_ff, t)
        return x_s, x_ff

    def _forward_folded(self, x) -> Sequence[jnp.ndarray]:
        assert not any(
            list(st.nonlocal_inds[p]) if st.nonlocal_inds else []
            for st in (self.s2, self.s3, self.s4, self.s5) for p in (0, 1)), \
            "folded fast pathway does not support non-local blocks"
        # _folded_conv lowers everything with feature_group_count=1 — a
        # grouped bottleneck would be silently wrong folded (advisor r4)
        assert self.cfg.num_groups == 1, \
            "folded fast pathway supports num_groups == 1 only"
        if os.environ.get("MSPI_SF_FOLD_STEM", "1") != "0":
            # phase 2: fast stem computed in the folded layout end to end
            x_s = self.s1.pathway0_stem(x[0], train=False)
            x_ff = _folded_fast_stem(self.s1.pathway1_stem, x[1], x_s.dtype)
            t = x[1].shape[1]
        else:
            x_s, x_f5 = self.s1(x, train=False)
            b, t, hh, ww, c = x_f5.shape
            x_ff = x_f5.transpose(0, 2, 3, 1, 4).reshape(b, hh, ww, t * c)
        x_s = self._folded_fuse(self.s1_fuse, x_s, x_ff, t)
        x_s, x_ff = self._stage_split(self.s2, x_s, x_ff, t)
        x_s = self._folded_fuse(self.s2_fuse, x_s, x_ff, t)
        feas = [x_s]
        x_s, x_ff = self._stage_split(self.s3, x_s, x_ff, t)
        x_s = self._folded_fuse(self.s3_fuse, x_s, x_ff, t)
        feas.append(x_s)
        x_s, x_ff = self._stage_split(self.s4, x_s, x_ff, t)
        x_s = self._folded_fuse(self.s4_fuse, x_s, x_ff, t)
        feas.append(x_s)
        # s5 fast output feeds nothing (the plain path's is DCE'd by XLA);
        # only the slow pathway contributes the last pyramid level
        for i in range(self.s5.num_blocks[0]):
            x_s = getattr(self.s5, f"pathway0_res{i}")(x_s, train=False)
        feas.append(x_s)
        return feas
