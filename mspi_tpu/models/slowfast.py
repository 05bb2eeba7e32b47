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

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import SlowFastConfig
from mspi_tpu.models.resnet3d import ResStage, VideoModelStem
from mspi_tpu.ops import batchnorm, conv3d

_STAGE_DEPTH = {18: (2, 2, 2, 2), 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}
# "slowfast" temporal kernel basis (sf.py:74-80)
_TEMP_KERNEL = [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]]


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
