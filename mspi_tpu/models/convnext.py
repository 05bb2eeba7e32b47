"""ConvNeXt-Tiny feature extractor (the frozen image-saliency prior).

Reference: model/model_utils.py:357-385 builds
`timm.create_model("convnext_tiny", features_only=True)` and wraps it with two
smooth heads.  Here the ConvNeXt-T trunk is implemented natively in flax —
channels-last end to end (ConvNeXt is already a channels-last architecture;
on TPU we never permute at all, unlike the torch version which round-trips
NCHW<->NHWC inside every block).

Scope names follow timm's FeatureListNet state-dict flattening
(stem.0/stem.1, stages_0.blocks.N.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma},
stages_i.downsample.{0,1}) so the released
`image_saliency_encoder_convnext_tiny.pt` converts mechanically.

ConvNeXt-T: depths (3,3,9,3), dims (96,192,384,768), layer-scale 1e-6.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import (Sequential, conv2d, dense, gelu, layernorm,
                          stem_conv2d, trunc_normal_init)


class ConvNeXtBlock2d(nn.Module):
    """timm ConvNeXtBlock: 7x7 depthwise -> LN -> MLP(4x, GELU) -> gamma."""

    dim: int
    layer_scale_init: float = 1e-6

    def setup(self):
        self.conv_dw = conv2d(self.dim, self.dim, 7, padding=3, groups=self.dim,
                              kernel_init=trunc_normal_init(0.02))
        self.norm = layernorm(epsilon=1e-6)
        self.mlp = Mlp2d(self.dim, 4 * self.dim)
        self.gamma = self.param(
            "gamma", lambda key, shape: jnp.full(shape, self.layer_scale_init), (self.dim,)
        )

    def __call__(self, x):
        import os

        from mspi_tpu.ops.pallas.mlp import (maybe_fused_ln_mlp,
                                             maybe_fused_ln_mlp_t)

        shortcut = x
        x = self.conv_dw(x)
        # XLA lays the prior's conv stack out batch-minor (B*T=128 in lanes,
        # C=96 too narrow); the fused kernel wants token-major, so each call
        # pays a relayout copy pair (~3 ms/block at stage 0, r3 profile).
        # MSPI_PRIOR_FUSED=0 keeps the prior on XLA's own LN+MLP chain in
        # its native layout to A/B kernel-win vs copy-cost.  The transposed
        # kernel (MSPI_PRIOR_FUSED_T) consumes the batch-minor layout
        # directly — no boundary copies at all.
        y = None
        if os.environ.get("MSPI_PRIOR_FUSED_T", "1") == "1":
            # MSPI_PRIOR_FOLD_RES=1 folds shortcut+gamma into the kernel
            # (returns `shortcut + gamma * mlp(ln(x))` directly).  Measured
            # REGRESSION on the flagship (70.1 vs 71.7 control, same-session
            # A/B): the second in-kernel input stream costs more than XLA's
            # residual fusion saves — default OFF, kept for re-measurement.
            fold = os.environ.get("MSPI_PRIOR_FOLD_RES", "0") == "1"
            out = maybe_fused_ln_mlp_t(
                self.norm, self.mlp, x, deterministic=True,
                shortcut=shortcut if fold else None,
                gamma=self.gamma if fold else None)
            if out is not None:
                if fold:
                    return out
                y = out
        if y is None and os.environ.get("MSPI_PRIOR_FUSED", "1") == "1":
            # deterministic=True: the prior is the always-frozen image
            # encoder (engine.py FROZEN_TOPLEVEL stop-grad prunes its
            # backward), so the fwd-only VMEM budget admits the stage-3
            # 768x3072 MLPs here even during flagship training
            y = maybe_fused_ln_mlp(self.norm, self.mlp, x,
                                   deterministic=True)
        if y is None:
            y = self.mlp(self.norm(x))
        # gamma is an fp32 param: cast to the activation dtype or the
        # multiply promotes the residual stream to fp32 — which silently ran
        # the ENTIRE prior (18 blocks of DW convs, LN+MLP, copies) in fp32
        # under --bf16 (r3 profile: ~7 ms/iter fp32 DW conv + 3 ms/iter
        # layout copies at stage 0 alone).
        return shortcut + self.gamma.astype(y.dtype) * y


class Mlp2d(nn.Module):
    dim: int
    hidden: int

    def setup(self):
        self.fc1 = dense(self.dim, self.hidden, kernel_init=trunc_normal_init(0.02))
        self.fc2 = dense(self.hidden, self.dim, kernel_init=trunc_normal_init(0.02))

    def __call__(self, x):
        return self.fc2(gelu(self.fc1(x)))


def _apply_ln_t(norm_module, x):
    """Route a stem/downsample LayerNorm through the transposed-layout
    Pallas LN (MSPI_PRIOR_LN_T).  Measured REGRESSION on the flagship
    (69.7 vs 71.7 control, same-session A/B): XLA's convert_reduce chain
    only materializes the stats pass — the normalize is fused into the
    consumer conv — so a standalone kernel ADDS a full tensor write.
    Default OFF; kept as the measured null.  The prior is always
    frozen/eval, so deterministic=True unconditionally."""
    import os

    from mspi_tpu.ops.pallas.mlp import maybe_fused_ln_t

    if os.environ.get("MSPI_PRIOR_LN_T", "0") == "1":
        y = maybe_fused_ln_t(norm_module, x, deterministic=True)
        if y is not None:
            return y
    return norm_module(x)


class ConvNeXtStage(nn.Module):
    in_dim: int
    dim: int
    depth: int
    has_downsample: bool  # 2x2 stride-2 conv preceded by LN

    def setup(self):
        if self.has_downsample:
            self.downsample = Sequential([
                layernorm(epsilon=1e-6),
                conv2d(self.in_dim, self.dim, 2, stride=2,
                       kernel_init=trunc_normal_init(0.02)),
            ])
        self.blocks = Sequential([ConvNeXtBlock2d(self.dim) for _ in range(self.depth)])

    def __call__(self, x):
        if self.has_downsample:
            x = _apply_ln_t(self.downsample.layers[0], x)
            x = self.downsample.layers[1](x)
        return self.blocks(x)


class ConvNeXtTinyFeatures(nn.Module):
    """features_only ConvNeXt-T: [B,H,W,3] -> 4 maps at strides 4/8/16/32
    with dims (96, 192, 384, 768)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)

    def setup(self):
        self.stem = Sequential([
            stem_conv2d(3, self.dims[0], 4, stride=4,
                        kernel_init=trunc_normal_init(0.02)),
            layernorm(epsilon=1e-6),
        ])
        stages = []
        in_dim = self.dims[0]
        for i, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            stages.append(ConvNeXtStage(in_dim, dim, depth, has_downsample=(i > 0)))
            in_dim = dim
        self.stages_0, self.stages_1, self.stages_2, self.stages_3 = stages

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        x = self.stem.layers[0](x)
        x = _apply_ln_t(self.stem.layers[1], x)
        o0 = self.stages_0(x)
        o1 = self.stages_1(o0)
        o2 = self.stages_2(o1)
        o3 = self.stages_3(o2)
        return o0, o1, o2, o3
