"""Shared 3-D ResNet building blocks (stems, transforms, residual stages).

Reference: /root/reference/SlowFast/stem_helper.py (VideoModelStem,
ResNetBasicStem, X3DStem) and /root/reference/SlowFast/resnet_helper.py
(BasicTransform, BottleneckTransform, X3DTransform, SE, Swish, ResBlock,
ResStage) — the machinery both the X3D and SlowFast backbones build on.

Channels-last [B,T,H,W,C]; module scopes mirror the torch attribute names
(s1.pathway0_stem.conv_xy, s2.pathway0_res0.branch2.a, ...) so the released
.pyth / caffe2-converted checkpoints convert mechanically.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import (adaptive_avg_pool, batchnorm, conv3d, max_pool, pconv3d,
                          stem_conv3d)


def round_width(width, multiplier, min_width=1, divisor=1):
    """X3D channel rounding (X3D.py:100-109)."""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def swish(x):
    return x * jax.nn.sigmoid(x)


class SE(nn.Module):
    """Squeeze-Excitation with ReLU inner act (resnet_helper.py:27-73)."""

    dim_in: int
    ratio: float = 0.0625

    @staticmethod
    def _round_width(width, multiplier, min_width=8, divisor=8):
        if not multiplier:
            return width
        width *= multiplier
        min_width = min_width or divisor
        width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
        if width_out < 0.9 * width:
            width_out += divisor
        return int(width_out)

    def setup(self):
        dim_fc = self._round_width(self.dim_in, self.ratio)
        self.fc1 = conv3d(self.dim_in, dim_fc, 1, bias=True)
        self.fc2 = conv3d(dim_fc, self.dim_in, 1, bias=True)

    def __call__(self, x):
        s = adaptive_avg_pool(x, 3)
        s = jax.nn.relu(self.fc1(s))
        s = jax.nn.sigmoid(self.fc2(s))
        return x * s


class ResNetBasicStem(nn.Module):
    """Tx7x7 conv + BN + ReLU + 1x3x3 maxpool (stem_helper.py:160-205)."""

    dim_in: int
    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]

    def setup(self):
        conv_fn = stem_conv3d if self.dim_in <= 4 else (
            lambda *a, bias: conv3d(*a, bias=bias))
        self.conv = conv_fn(self.dim_in, self.dim_out, self.kernel,
                            self.stride, self.padding, bias=False)
        self.bn = batchnorm()

    def __call__(self, x, train: bool = False):
        x = jax.nn.relu(self.bn(self.conv(x), use_running_average=not train))
        return max_pool(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))


class X3DStem(nn.Module):
    """Spatial 1xkxk conv then depthwise temporal kx1x1 conv + BN + ReLU
    (stem_helper.py:207-288)."""

    dim_in: int
    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]

    def setup(self):
        k, s, p = self.kernel, self.stride, self.padding
        conv_fn = stem_conv3d if self.dim_in <= 4 else (
            lambda *a, bias: conv3d(*a, bias=bias))
        self.conv_xy = conv_fn(self.dim_in, self.dim_out, (1, k[1], k[2]),
                               (1, s[1], s[2]), (0, p[1], p[2]), bias=False)
        self.conv = conv3d(self.dim_out, self.dim_out, (k[0], 1, 1),
                           (s[0], 1, 1), (p[0], 0, 0), groups=self.dim_out,
                           bias=False)
        self.bn = batchnorm()

    def __call__(self, x, train: bool = False):
        x = self.conv(self.conv_xy(x))
        return jax.nn.relu(self.bn(x, use_running_average=not train))


class VideoModelStem(nn.Module):
    """Per-pathway stems named pathway{i}_stem (stem_helper.py:21-157)."""

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    kernel: Sequence[Tuple[int, int, int]]
    stride: Sequence[Tuple[int, int, int]]
    padding: Sequence[Tuple[int, int, int]]
    stem_func_name: str = "basic_stem"

    def setup(self):
        cls = {"basic_stem": ResNetBasicStem, "x3d_stem": X3DStem}[self.stem_func_name]
        for p in range(len(self.dim_in)):
            setattr(self, f"pathway{p}_stem",
                    cls(self.dim_in[p], self.dim_out[p], tuple(self.kernel[p]),
                        tuple(self.stride[p]), tuple(self.padding[p])))

    def __call__(self, xs, train: bool = False):
        return [getattr(self, f"pathway{p}_stem")(x, train=train)
                for p, x in enumerate(xs)]


class BasicTransform(nn.Module):
    """Tx3x3 + 1x3x3 (resnet_helper.py:122-208)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: Optional[int] = None
    num_groups: int = 1
    block_idx: int = 0

    def setup(self):
        t = self.temp_kernel_size
        self.a = conv3d(self.dim_in, self.dim_out, (t, 3, 3), (1, self.stride, self.stride),
                        (t // 2, 1, 1), bias=False)
        self.a_bn = batchnorm()
        self.b = conv3d(self.dim_out, self.dim_out, (1, 3, 3), 1, (0, 1, 1), bias=False)
        self.b_bn = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jax.nn.relu(self.a_bn(self.a(x), use_running_average=ra))
        return self.b_bn(self.b(x), use_running_average=ra)


class BottleneckTransform(nn.Module):
    """Tx1x1 -> 1x3x3 -> 1x1x1 (resnet_helper.py:355-487)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    block_idx: int = 0

    def setup(self):
        t = self.temp_kernel_size
        # (t,1,1) degenerates to pointwise at t == 1: matmul lowering
        # (PointwiseConv3d — the r3 decoder fix, ~12x on small-T 5-D convs)
        self.a = (pconv3d(self.dim_in, self.dim_inner, bias=False) if t == 1
                  else conv3d(self.dim_in, self.dim_inner, (t, 1, 1), 1,
                              (t // 2, 0, 0), bias=False))
        self.a_bn = batchnorm()
        self.b = conv3d(self.dim_inner, self.dim_inner, (1, 3, 3),
                        (1, self.stride, self.stride), (0, 1, 1),
                        groups=self.num_groups, bias=False)
        self.b_bn = batchnorm()
        self.c = pconv3d(self.dim_inner, self.dim_out, bias=False)
        self.c_bn = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jax.nn.relu(self.a_bn(self.a(x), use_running_average=ra))
        x = jax.nn.relu(self.b_bn(self.b(x), use_running_average=ra))
        return self.c_bn(self.c(x), use_running_average=ra)


class X3DTransform(nn.Module):
    """1x1x1 -> Tx3x3 channelwise (+SE every other block, Swish) -> 1x1x1
    (resnet_helper.py:213-351)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    block_idx: int = 0
    se_ratio: float = 0.0625

    def setup(self):
        t = self.temp_kernel_size
        self.a = pconv3d(self.dim_in, self.dim_inner, bias=False)
        self.a_bn = batchnorm()
        self.b = conv3d(self.dim_inner, self.dim_inner, (t, 3, 3),
                        (1, self.stride, self.stride), (t // 2, 1, 1),
                        groups=self.num_groups, bias=False)
        self.b_bn = batchnorm()
        self.use_se = self.se_ratio > 0.0 and ((self.block_idx + 1) % 2 == 1)
        if self.use_se:
            self.se = SE(self.dim_inner, self.se_ratio)
        self.c = pconv3d(self.dim_inner, self.dim_out, bias=False)
        self.c_bn = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jax.nn.relu(self.a_bn(self.a(x), use_running_average=ra))
        x = self.b_bn(self.b(x), use_running_average=ra)
        if self.use_se:
            x = self.se(x)
        x = swish(x)
        return self.c_bn(self.c(x), use_running_average=ra)


class CSNTransform(nn.Module):
    """ir-CSN bottleneck: 1x1x1 -> channel-separated (depthwise) Tx3x3 ->
    1x1x1 (the pytorchvideo create_csn bottleneck the reference's
    ptv_model_builder.py:14 imports; "Video Classification with
    Channel-Separated Convolutional Networks")."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1  # unused: conv_b groups == dim_inner by definition
    block_idx: int = 0

    def setup(self):
        t = self.temp_kernel_size
        self.a = pconv3d(self.dim_in, self.dim_inner, bias=False)
        self.a_bn = batchnorm()
        self.b = conv3d(self.dim_inner, self.dim_inner, (t, 3, 3),
                        (1, self.stride, self.stride), (t // 2, 1, 1),
                        groups=self.dim_inner, bias=False)
        self.b_bn = batchnorm()
        self.c = pconv3d(self.dim_inner, self.dim_out, bias=False)
        self.c_bn = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jax.nn.relu(self.a_bn(self.a(x), use_running_average=ra))
        x = jax.nn.relu(self.b_bn(self.b(x), use_running_average=ra))
        return self.c_bn(self.c(x), use_running_average=ra)


class R2Plus1DTransform(nn.Module):
    """(2+1)D bottleneck: 1x1x1 -> [1x3x3 spatial -> BN+ReLU -> Tx1x1
    temporal] -> 1x1x1 (pytorchvideo create_2plus1d_bottleneck_block via
    the reference's ptv_model_builder.py:20).  The factorization's middle
    width follows the R(2+1)D paper: Mi = floor(t*3*3*Ci*Co /
    (3*3*Ci + t*Co)), matching the 3-D conv's parameter count."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int = 1
    block_idx: int = 0

    def setup(self):
        t = self.temp_kernel_size
        ci = co = self.dim_inner
        mid = (t * 9 * ci * co) // (9 * ci + t * co)
        self.a = pconv3d(self.dim_in, self.dim_inner, bias=False)
        self.a_bn = batchnorm()
        self.b_xy = conv3d(self.dim_inner, mid, (1, 3, 3),
                           (1, self.stride, self.stride), (0, 1, 1), bias=False)
        self.b_xy_bn = batchnorm()
        self.b_t = conv3d(mid, self.dim_inner, (t, 1, 1), 1,
                          (t // 2, 0, 0), bias=False)
        self.b_bn = batchnorm()
        self.c = pconv3d(self.dim_inner, self.dim_out, bias=False)
        self.c_bn = batchnorm()

    def __call__(self, x, train: bool = False):
        ra = not train
        x = jax.nn.relu(self.a_bn(self.a(x), use_running_average=ra))
        x = jax.nn.relu(self.b_xy_bn(self.b_xy(x), use_running_average=ra))
        x = jax.nn.relu(self.b_bn(self.b_t(x), use_running_average=ra))
        return self.c_bn(self.c(x), use_running_average=ra)


TRANS_FUNCS = {
    "basic_transform": BasicTransform,
    "bottleneck_transform": BottleneckTransform,
    "x3d_transform": X3DTransform,
    "csn_transform": CSNTransform,
    "r2plus1d_transform": R2Plus1DTransform,
}


class ResBlock(nn.Module):
    """Residual block with optional projection shortcut
    (resnet_helper.py:490-617)."""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int = 1
    block_idx: int = 0

    def setup(self):
        if self.dim_in != self.dim_out or self.stride != 1:
            self.branch1 = conv3d(self.dim_in, self.dim_out, 1,
                                  (1, self.stride, self.stride), 0, bias=False)
            self.branch1_bn = batchnorm()
            self.has_branch1 = True
        else:
            self.has_branch1 = False
        self.branch2 = TRANS_FUNCS[self.trans_func_name](
            self.dim_in, self.dim_out, self.temp_kernel_size, self.stride,
            self.dim_inner, self.num_groups, block_idx=self.block_idx)

    def __call__(self, x, train: bool = False):
        f_x = self.branch2(x, train=train)
        if self.has_branch1:
            x = self.branch1_bn(self.branch1(x), use_running_average=not train) + f_x
        else:
            x = x + f_x
        return jax.nn.relu(x)


class ResStage(nn.Module):
    """Multi-pathway residual stage; blocks named pathway{p}_res{i}
    (resnet_helper.py:620-825), with optional non-local blocks inserted
    after the blocks listed in nonlocal_inds (resnet_helper.py:782-792,
    named pathway{p}_nonlocal{i} like the torch module tree).  The MSPI
    configs use empty NONLOCAL.LOCATION everywhere; the classifier zoo's
    i3d/slow NLN variants enable it."""

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    stride: Sequence[int]
    temp_kernel_sizes: Sequence[Sequence[int]]
    num_blocks: Sequence[int]
    dim_inner: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    trans_func_name: str = "bottleneck_transform"
    nonlocal_inds: Sequence[Sequence[int]] = ()
    nonlocal_group: Sequence[int] = ()
    nonlocal_pool: Sequence[Sequence[int]] = ()
    nonlocal_instantiation: str = "softmax"

    def setup(self):
        # extend temporal kernels to num_block_temp_kernel blocks, 1 after
        self.tks = [
            (list(self.temp_kernel_sizes[i]) * self.num_blocks[i])[: self.num_block_temp_kernel[i]]
            + [1] * (self.num_blocks[i] - self.num_block_temp_kernel[i])
            for i in range(len(self.temp_kernel_sizes))
        ]
        for p in range(len(self.num_blocks)):
            nl_inds = set(self.nonlocal_inds[p]) if self.nonlocal_inds else set()
            for i in range(self.num_blocks[p]):
                block = ResBlock(
                    self.dim_in[p] if i == 0 else self.dim_out[p],
                    self.dim_out[p],
                    self.tks[p][i],
                    self.stride[p] if i == 0 else 1,
                    self.trans_func_name,
                    self.dim_inner[p],
                    self.num_groups[p],
                    block_idx=i,
                )
                setattr(self, f"pathway{p}_res{i}", block)
                if i in nl_inds:
                    from mspi_tpu.models.nonlocal_block import Nonlocal

                    pool = (tuple(self.nonlocal_pool[p])
                            if self.nonlocal_pool else None)
                    setattr(self, f"pathway{p}_nonlocal{i}", Nonlocal(
                        dim=self.dim_out[p], dim_inner=self.dim_out[p] // 2,
                        pool_size=pool,
                        instantiation=self.nonlocal_instantiation))

    def __call__(self, inputs, train: bool = False):
        output = []
        for p in range(len(self.num_blocks)):
            x = inputs[p]
            nl_inds = set(self.nonlocal_inds[p]) if self.nonlocal_inds else set()
            group = (self.nonlocal_group[p]
                     if self.nonlocal_group else 1)
            for i in range(self.num_blocks[p]):
                x = getattr(self, f"pathway{p}_res{i}")(x, train=train)
                if i in nl_inds:
                    nln = getattr(self, f"pathway{p}_nonlocal{i}")
                    if group > 1:
                        # fold temporal groups into the batch so attention is
                        # restricted within each chunk (resnet_helper.py:795-807)
                        B, T, H, W, C = x.shape
                        x = x.reshape(B * group, T // group, H, W, C)
                    x = nln(x, train=train)
                    if group > 1:
                        x = x.reshape(B, T, H, W, C)
            output.append(x)
        return output
