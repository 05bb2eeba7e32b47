"""X3D-L video backbone.

Reference: /root/reference/backbones/X3D.py (X3D-L via configs/X3D_L.yaml:
width 2.0, depth 5.0, bottleneck 2.25, dim_c1 12, channelwise 3x3x3 convs,
SE every other block, Swish).  Stages s2..s5 give the pyramid
(24, 48, 96, 192) at strides 4/8/16/32 with T=16 preserved throughout
(X3D.py:236-243 collects per-stage features).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.config import X3DConfig
from mspi_tpu.models.resnet3d import ResStage, VideoModelStem, round_width


class X3DFeatures(nn.Module):
    """[B,16,H,W,3] -> [s2, s3, s4, s5] channels-last pyramid."""

    cfg: X3DConfig

    def setup(self):
        c = self.cfg
        w_mul, d_mul = c.width_factor, c.depth_factor
        dim_c1 = c.dim_c1
        # SCALE_RES2=False (SlowFast defaults.py:349): res2 keeps dim_c1
        dim_res2 = dim_c1
        dim_res3 = round_width(dim_res2, 2.0, divisor=8)
        dim_res4 = round_width(dim_res3, 2.0, divisor=8)
        dim_res5 = round_width(dim_res4, 2.0, divisor=8)
        block_basis = [(1, dim_res2, 2), (2, dim_res3, 2), (5, dim_res4, 2), (3, dim_res5, 2)]

        dim_res1 = round_width(dim_c1, w_mul)
        self.s1 = VideoModelStem(
            dim_in=[3], dim_out=[dim_res1], kernel=[(5, 3, 3)],
            stride=[(1, 2, 2)], padding=[(2, 1, 1)], stem_func_name="x3d_stem")

        dim_in = dim_res1
        stages = []
        for blocks, dim, stride in block_basis:
            dim_out = round_width(dim, w_mul)
            dim_inner = int(c.bottleneck_factor * dim_out)
            n_rep = int(math.ceil(d_mul * blocks))
            stages.append(ResStage(
                dim_in=[dim_in], dim_out=[dim_out], dim_inner=[dim_inner],
                temp_kernel_sizes=[[3]], stride=[stride], num_blocks=[n_rep],
                num_groups=[dim_inner],  # CHANNELWISE_3x3x3
                num_block_temp_kernel=[n_rep], trans_func_name="x3d_transform"))
            dim_in = dim_out
        self.s2, self.s3, self.s4, self.s5 = stages

    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        xs = self.s1([x], train=train)
        feas = []
        for stage in (self.s2, self.s3, self.s4, self.s5):
            xs = stage(xs, train=train)
            feas.append(xs[0])
        return feas
