"""Core neural-net layers, channels-last, with exact torch numerics.

Everything here is a thin, TPU-idiomatic wrapper over flax/lax primitives.
Tensors are channels-last: video activations are [B, T, H, W, C] (XLA's
preferred conv layout on TPU — the MXU consumes the C dimension directly),
images [B, H, W, C], audio spectrograms [B, F, Tw, C].

Torch-parity notes (these wrappers are what makes 0.999-CC weight-converted
parity possible):
- Convs use symmetric explicit padding and floor output sizing, like torch.
- BatchNorm: torch `running = (1-m)*running + m*batch` with m=momentum; flax
  uses the complementary convention, so `momentum_flax = 1 - momentum_torch`.
- Max pooling pads with -inf and floors the output size, like torch.
- `resize_linear` is half-pixel linear interpolation == torch
  `interpolate(..., align_corners=False)`.
- `gelu` is the exact erf formulation (torch default), not tanh.
- Default initializers mirror torch's kaiming-uniform(a=sqrt(5)) fan-in
  scheme so from-scratch training dynamics match the reference.

Layer factories (conv2d/conv3d/dense/batchnorm/layernorm) return *bare* flax
primitives so the flax param tree nests exactly like the torch module tree —
the weight converter in mspi_tpu/convert is then fully mechanical.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
IntOrTuple = Union[int, Sequence[int]]

# Global compute dtype for mixed precision: params stay float32, layer
# computation casts to this dtype (flax `dtype` semantics). None = float32.
_DEFAULT_COMPUTE_DTYPE: list = [None]


def set_default_compute_dtype(dtype) -> None:
    """Set the compute dtype used by all layer factories (e.g. jnp.bfloat16
    for the TPU fast path). Call before building/applying a model."""
    _DEFAULT_COMPUTE_DTYPE[0] = dtype


def default_compute_dtype():
    return _DEFAULT_COMPUTE_DTYPE[0]


def _to_tuple(x: IntOrTuple, n: int) -> Tuple[int, ...]:
    if isinstance(x, int):
        return (x,) * n
    t = tuple(x)
    assert len(t) == n, (x, n)
    return t


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU — torch nn.GELU default."""
    return jax.nn.gelu(x, approximate=False)


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv/Linear default: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)).

    For conv kernels shaped [*spatial, in/groups, out], fan_in =
    prod(spatial) * in/groups; for dense kernels [in, out], fan_in = in.
    """
    fan_in = 1
    for d in shape[:-1]:
        fan_in *= d
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(stddev: float = 0.02):
    """timm trunc_normal_(std=s): normal truncated to +-2 sigma."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev

    return init


def zeros_init():
    return jax.nn.initializers.zeros


def _conv(
    ndim: int,
    in_features: int,
    features: int,
    kernel_size: IntOrTuple,
    stride: IntOrTuple = 1,
    padding: IntOrTuple = 0,
    groups: int = 1,
    bias: bool = True,
    dilation: IntOrTuple = 1,
    dtype: Optional[Dtype] = None,
    kernel_init: Optional[Callable] = None,
    bias_init: Optional[Callable] = None,
    name: Optional[str] = None,
) -> nn.Conv:
    kernel = _to_tuple(kernel_size, ndim)
    pad = _to_tuple(padding, ndim)
    fan_in = (in_features // groups) * math.prod(kernel)
    return nn.Conv(
        features=features,
        kernel_size=kernel,
        strides=_to_tuple(stride, ndim),
        padding=[(p, p) for p in pad],
        feature_group_count=groups,
        use_bias=bias,
        kernel_dilation=_to_tuple(dilation, ndim),
        dtype=dtype if dtype is not None else default_compute_dtype(),
        kernel_init=kernel_init or torch_kernel_init,
        bias_init=bias_init or torch_bias_init(fan_in),
        name=name,
    )


def conv3d(in_features: int, features: int, kernel_size: IntOrTuple, stride: IntOrTuple = 1,
           padding: IntOrTuple = 0, groups: int = 1, bias: bool = True,
           dilation: IntOrTuple = 1, dtype=None, kernel_init=None, bias_init=None,
           name: Optional[str] = None) -> nn.Conv:
    """torch nn.Conv3d equivalent, channels-last [B,T,H,W,C]."""
    return _conv(3, in_features, features, kernel_size, stride, padding, groups,
                 bias, dilation, dtype, kernel_init, bias_init, name)


def conv2d(in_features: int, features: int, kernel_size: IntOrTuple, stride: IntOrTuple = 1,
           padding: IntOrTuple = 0, groups: int = 1, bias: bool = True,
           dilation: IntOrTuple = 1, dtype=None, kernel_init=None, bias_init=None,
           name: Optional[str] = None) -> nn.Conv:
    """torch nn.Conv2d equivalent, channels-last [B,H,W,C]."""
    return _conv(2, in_features, features, kernel_size, stride, padding, groups,
                 bias, dilation, dtype, kernel_init, bias_init, name)


class PointwiseConv3d(nn.Module):
    """1x1x1 conv3d applied as an explicit token matmul — identical param
    tree to nn.Conv (kernel [1,1,1,Cin,Cout], bias [Cout]) and the same
    contraction, so checkpoints/converter are untouched.

    XLA's TPU conv emitters schedule the decoder's 1x1x1 convs on small-T
    5-D tensors with EmitAllBatchInSublanes at ~12x off the matmul roofline
    (r3 HLO: latlayer_0 pwconv2 bf16[8,4,56,96,192] estimated 3.19 ms vs a
    ~0.26 ms dot).  dot_general over [..., Cin] gets the plain MXU matmul
    emitter instead.  MSPI_DISABLE_PWMM=1 restores the nn.Conv lowering
    for A/B."""

    in_features: int
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init or torch_kernel_init,
                            (1, 1, 1, self.in_features, self.features))
        bias = (self.param("bias", self.bias_init
                           or torch_bias_init(self.in_features),
                           (self.features,)) if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        dt = self.dtype if self.dtype is not None else default_compute_dtype()
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=dt)
        if os.environ.get("MSPI_DISABLE_PWMM"):
            y = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1, 1), padding=[(0, 0)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        else:
            y = jax.lax.dot_general(
                x, kernel[0, 0, 0],
                dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())))
        if bias is None:
            return y
        return (_bias_add_mm(y, bias) if _colred_mm() else y + bias)


def pconv3d(in_features: int, features: int, bias: bool = True, dtype=None,
            kernel_init=None, bias_init=None,
            name: Optional[str] = None) -> PointwiseConv3d:
    """Drop-in for conv3d(in, out, 1, 1, 0): matmul lowering, same params."""
    return PointwiseConv3d(in_features, features, use_bias=bias, dtype=dtype,
                           kernel_init=kernel_init, bias_init=bias_init,
                           name=name)


def _tapgrad_conv_fwd_op(x, w, stride, padding, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[(p, p) for p in padding],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=groups)


def _colred_mm() -> bool:
    return os.environ.get("MSPI_COLRED_MM", "0") == "1"


@jax.custom_vjp
def _bias_add_mm(y, b):
    """y + b whose db is a ones-vector MATMUL over tokens instead of the
    autodiff column-reduce: the r5 train profile showed the decoder bias
    grads emitted as ~2 ms serial [N,C]->[C] reduce fusions (fast standalone
    — the pathology is fusion-context, so the fix forces a dot_general that
    XLA schedules on the MXU)."""
    return y + b


def _bias_add_mm_fwd(y, b):
    return y + b, None


def _bias_add_mm_bwd(_res, g):
    gf = g.reshape(-1, g.shape[-1])
    ones = jnp.ones((1, gf.shape[0]), g.dtype)
    db = jax.lax.dot_general(ones, gf, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)[0]
    return g, db.astype(g.dtype)


_bias_add_mm.defvjp(_bias_add_mm_fwd, _bias_add_mm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tapgrad_conv(x, w, stride, padding, groups):
    return _tapgrad_conv_fwd_op(x, w, stride, padding, groups)


def _tapgrad_conv_fwd(x, w, stride, padding, groups):
    return _tapgrad_conv_fwd_op(x, w, stride, padding, groups), (x, w)


def _tapgrad_conv_bwd(stride, padding, groups, res, dy):
    x, w = res
    kt, kh, kw, cig, co = w.shape
    B, _, _, _, Ci = x.shape
    _, To, Ho, Wo, _ = dy.shape
    st, sh, sw = stride
    # dx: the same conv-transpose XLA's autodiff emits (it was never the
    # slow part — only the weight-grad emitter is)
    dx = jax.linear_transpose(
        lambda x_: _tapgrad_conv_fwd_op(x_, w, stride, padding, groups),
        jax.ShapeDtypeStruct(x.shape, x.dtype))(dy)[0]
    xp = jnp.pad(x, ((0, 0), (padding[0],) * 2, (padding[1],) * 2,
                     (padding[2],) * 2, (0, 0)))
    dyf = dy.reshape(-1, co)
    taps = []
    for dt_ in range(kt):
        for dh_ in range(kh):
            for dw_ in range(kw):
                xs = jax.lax.slice(
                    xp, (0, dt_, dh_, dw_, 0),
                    (B, dt_ + (To - 1) * st + 1, dh_ + (Ho - 1) * sh + 1,
                     dw_ + (Wo - 1) * sw + 1, Ci),
                    (1, st, sh, sw, 1)).reshape(-1, Ci)
                if groups == 1:
                    taps.append(jax.lax.dot_general(
                        xs, dyf, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))  # [Ci, Co]
                else:  # depthwise (cig == 1, co == groups == Ci)
                    if _colred_mm():
                        # per-channel token reduce as a ones-vector matmul
                        # (MXU) instead of a column-reduce fusion
                        prod = (xs * dyf).astype(jnp.float32)
                        ones = jnp.ones((1, prod.shape[0]), jnp.float32)
                        taps.append(jax.lax.dot_general(
                            ones, prod, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32))  # [1, Co]
                    else:
                        taps.append(jnp.sum(
                            xs.astype(jnp.float32) * dyf.astype(jnp.float32),
                            axis=0)[None])  # [1, Co]
    dw = jnp.stack(taps).reshape(kt, kh, kw, cig, co).astype(w.dtype)
    return dx, dw


_tapgrad_conv.defvjp(_tapgrad_conv_fwd, _tapgrad_conv_bwd)


class TapGradConv3d(nn.Module):
    """conv3d whose WEIGHT GRAD is computed as per-tap token matmuls —
    identical forward lowering and param tree to nn.Conv, so checkpoints
    and the converter are untouched.

    XLA's conv weight-grad emitter runs the decoder's small-T 5-D convs
    far off the matmul roofline (r4 train profile: the readout 3x3x3
    192->192 dW fusion alone was 5.5 ms/step at batch 2, ~13x off).
    dW[tap] = x_shifted^T dy flattened over (B,T,H,W) rides the plain MXU
    matmul emitter (fp32 accumulation; depthwise groups reduce on the VPU);
    dx keeps XLA's conv-transpose via linear_transpose of the forward.
    Supports groups == 1 and full depthwise (groups == Cin == Cout).
    MSPI_DISABLE_TAPGRAD=1 restores plain nn.Conv autodiff for A/B."""

    in_features: int
    features: int
    kernel_size: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (0, 0, 0)
    groups: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        # the tap-dW only handles dense and FULL depthwise; 1 < groups < Cin
        # would silently compute a wrong dW (advisor r4) — fail loudly
        assert self.groups == 1 or (self.groups == self.in_features
                                    and self.features == self.in_features), (
            f"TapGradConv3d supports groups==1 or full depthwise, got "
            f"groups={self.groups} Cin={self.in_features} Co={self.features}")
        k = self.kernel_size
        fan_in = (self.in_features // self.groups) * math.prod(k)
        kernel = self.param("kernel", self.kernel_init or torch_kernel_init,
                            (*k, self.in_features // self.groups,
                             self.features))
        bias = (self.param("bias", self.bias_init or torch_bias_init(fan_in),
                           (self.features,)) if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        dt = self.dtype if self.dtype is not None else default_compute_dtype()
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=dt)
        if os.environ.get("MSPI_DISABLE_TAPGRAD"):
            y = _tapgrad_conv_fwd_op(x, kernel, self.stride, self.padding,
                                     self.groups)
        else:
            y = _tapgrad_conv(x, kernel, self.stride, self.padding,
                              self.groups)
        if bias is None:
            return y
        return (_bias_add_mm(y, bias) if _colred_mm() else y + bias)


def conv3d_tapgrad(in_features: int, features: int, kernel_size: IntOrTuple,
                   stride: IntOrTuple = 1, padding: IntOrTuple = 0,
                   groups: int = 1, bias: bool = True, dtype=None,
                   kernel_init=None, bias_init=None,
                   name: Optional[str] = None) -> TapGradConv3d:
    """Drop-in for conv3d(...) with the tap-matmul weight grad."""
    return TapGradConv3d(
        in_features, features, _to_tuple(kernel_size, 3),
        _to_tuple(stride, 3), _to_tuple(padding, 3), groups, bias, dtype,
        kernel_init, bias_init, name=name)


def _s2d_enabled() -> bool:
    # stem space-to-depth rides the same twin-program gate as the Pallas
    # kernels so bench.py's FLOPs twin counts the TRUE model FLOPs (the
    # regrouped conv adds zero-weight taps XLA's analysis would count)
    return not (os.environ.get("MSPI_DISABLE_PALLAS")
                or os.environ.get("MSPI_DISABLE_S2D"))


def _fold_uint8_affine(x, w, b):
    """Raw-uint8 input support: fold the ImageNet normalization into the
    stem's weights instead of running a full-tensor normalize pass, so the
    uint8->compute-dtype convert fuses into the stem's own pad/regroup ops
    and the normalized clip is never materialized (r3 profile: its relayout
    copies feeding the two stems cost ~2.3 ms/iter at batch 8).

    Exact including conv padding: the scale folds into the RGB kernel rows
    (raw zero == scaled zero, so zero-pads stay correct), and the offset
    rides an appended ones-channel whose kernel row is sum_c W[...,c,:]*o[c]
    — the ones get zero-padded with the pixels, so border taps contribute
    exactly 0 as they do in normalized space.  s[c] = 1/(255*std[c]),
    o[c] = -mean[c]/std[c]; host-parity reference: data/video.py
    normalize_frames."""
    if x.dtype != jnp.uint8:
        return x, w, b
    assert w.shape[-2] == 3, ("uint8 input implies RGB frames; stem has "
                              f"Cin={w.shape[-2]}")
    from mspi_tpu.data.video import IMAGENET_MEAN, IMAGENET_STD

    s = jnp.asarray(1.0 / (255.0 * IMAGENET_STD), jnp.float32)
    o = jnp.asarray(-IMAGENET_MEAN / IMAGENET_STD, jnp.float32)
    wf = w.astype(jnp.float32)
    w_rgb = wf * s[:, None]
    w_ones = jnp.sum(wf * o[:, None], axis=-2, keepdims=True)
    w2 = jnp.concatenate([w_rgb, w_ones], axis=-2).astype(w.dtype)
    dt = default_compute_dtype() or jnp.float32
    xf = x.astype(dt)
    x2 = jnp.concatenate([xf, jnp.ones_like(xf[..., :1])], axis=-1)
    return x2, w2, b


class StemConv(nn.Module):
    """Low-C_in patchify conv3d as spatial space-to-depth + a fat conv.

    Drop-in for conv3d(3, C_out, k, s, p): identical param tree (kernel
    [kt,kh,kw,Cin,Cout], bias [Cout]) and exact numerics.  A stride-s
    stem with 3 input channels gives XLA a contraction depth of 3 per
    spatial tap, which runs ~85x off the MXU roofline (profiled 12.8 ms for
    MViT's (3,7,7)/s(2,4,4) embed at 16x224x384 batch 8).  Regrouping the
    padded input into stride-sized spatial blocks ([B,T,H/sh,W/sw,
    sh*sw*Cin]) turns the same sum into a stride-1 conv over block space
    with kernel (kt, ceil(kh/sh), ceil(kw/sw)) and an MXU-sized contraction
    (kernel taps that fall outside the original extent carry zero weights —
    the extra FLOPs are zeros, numerics unchanged).  The temporal axis
    stays a real conv dim so no tensor exceeds 6-D.

    The only layout cost is one transpose interleaving sh into the lane
    dim; the W-axis regroup is a contiguous reshape.
    """

    in_features: int
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kh, kw = self.kernel
        st, sh, sw = self.stride
        pt, ph, pw = self.padding
        Cin, Cout = self.in_features, self.features
        w = self.param("kernel", torch_kernel_init, (kt, kh, kw, Cin, Cout))
        b = (self.param("bias", torch_bias_init(Cin * kt * kh * kw), (Cout,))
             if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        x, w, b = _fold_uint8_affine(x, w, b)
        if x.dtype == jnp.uint8:
            # r5: keep the clip uint8 through the s2d pad+regroup (1 B/px
            # instead of 2) — the convert fuses into the final regroup copy
            # inside _s2d_conv3d.  The bf16 pad alone was 1.6 ms/iter and
            # the early convert another 1.5 (stem region 3.7% of floor).
            dt = default_compute_dtype()
            w, b = w.astype(dt), (None if b is None else b.astype(dt))
        else:
            x, w, b = promote_dtype(x, w, b, dtype=default_compute_dtype())
        return _s2d_conv3d(x, w, b, self.kernel, self.stride, self.padding)


def _s2d_conv3d(x, w, b, kernel, stride, padding):
    kt, kh, kw = kernel
    st, sh, sw = stride
    pt, ph, pw = padding
    Cin, Cout = w.shape[3], w.shape[4]

    if not _s2d_enabled() or (sh == 1 and sw == 1):
        y = jax.lax.conv_general_dilated(
            x.astype(w.dtype), w, window_strides=(st, sh, sw),
            padding=[(pt, pt), (ph, ph), (pw, pw)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return y + b if b is not None else y

    B, T, H, W, _ = x.shape
    out_h = (H + 2 * ph - kh) // sh + 1
    out_w = (W + 2 * pw - kw) // sw + 1
    kbh = (kh - 1) // sh + 1
    kbw = (kw - 1) // sw + 1
    Hb, Wb = out_h + kbh - 1, out_w + kbw - 1
    pad_h, pad_w = Hb * sh - H - ph, Wb * sw - W - pw
    assert pad_h >= 0 and pad_w >= 0, (kernel, stride, x.shape)
    # pad + W-regroup run in the INPUT dtype (uint8 clips stay 1 B/px);
    # the convert to the compute dtype fuses into the one transpose copy
    xp = jnp.pad(x, ((0, 0), (pt, pt), (ph, pad_h), (pw, pad_w), (0, 0)))
    xp = xp.reshape(B, T + 2 * pt, Hb, sh, Wb, sw * Cin)
    xp = xp.transpose(0, 1, 2, 4, 3, 5).astype(w.dtype).reshape(
        B, T + 2 * pt, Hb, Wb, sh * sw * Cin)
    # weight: pad each spatial kernel dim to block multiples (zero taps),
    # then regroup to [kt, kbh, kbw, sh*sw*Cin, Cout] in the same
    # (dh, dw, ci) flatten order as the input blocks
    wp = jnp.pad(w, ((0, 0), (0, kbh * sh - kh), (0, kbw * sw - kw),
                     (0, 0), (0, 0)))
    wp = wp.reshape(kt, kbh, sh, kbw, sw, Cin, Cout)
    wp = wp.transpose(0, 1, 3, 2, 4, 5, 6).reshape(
        kt, kbh, kbw, sh * sw * Cin, Cout)
    y = jax.lax.conv_general_dilated(
        xp, wp, window_strides=(st, 1, 1), padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b if b is not None else y


class StemConv2D(nn.Module):
    """2-D per-frame variant of StemConv (identical nn.Conv param tree,
    kernel [kh,kw,Cin,Cout]); used for the ConvNeXt patchify stem."""

    in_features: int
    features: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel
        Cin, Cout = self.in_features, self.features
        w = self.param("kernel", self.kernel_init or torch_kernel_init,
                       (kh, kw, Cin, Cout))
        b = (self.param("bias", torch_bias_init(Cin * kh * kw), (Cout,))
             if self.use_bias else None)
        from flax.linen.dtypes import promote_dtype

        x, w, b = _fold_uint8_affine(x, w, b)
        if x.dtype == jnp.uint8:
            # see StemConv: uint8 stays through the s2d pad+regroup
            dt = default_compute_dtype()
            w, b = w.astype(dt), (None if b is None else b.astype(dt))
        else:
            x, w, b = promote_dtype(x, w, b, dtype=default_compute_dtype())
        y = _s2d_conv3d(x[:, None], w[None], b, (1, kh, kw),
                        (1, *self.stride), (0, *self.padding))
        return y[:, 0]


def stem_conv3d(in_features: int, features: int, kernel_size: IntOrTuple,
                stride: IntOrTuple = 1, padding: IntOrTuple = 0,
                bias: bool = True, name: Optional[str] = None) -> StemConv:
    """conv3d for low-C_in patchify stems (space-to-depth lowering)."""
    return StemConv(in_features, features, _to_tuple(kernel_size, 3),
                    _to_tuple(stride, 3), _to_tuple(padding, 3),
                    use_bias=bias, name=name)


def stem_conv2d(in_features: int, features: int, kernel_size: IntOrTuple,
                stride: IntOrTuple = 1, padding: IntOrTuple = 0,
                bias: bool = True, kernel_init=None,
                name: Optional[str] = None) -> StemConv2D:
    """conv2d for low-C_in patchify stems (space-to-depth lowering)."""
    return StemConv2D(in_features, features, _to_tuple(kernel_size, 2),
                      _to_tuple(stride, 2), _to_tuple(padding, 2),
                      use_bias=bias, kernel_init=kernel_init, name=name)


class TemporalDWConv(nn.Module):
    """Depthwise (kt,1,1) conv3d with an optional shifted-slice stencil form.

    Drop-in for conv3d(dim, dim, (kt,1,1), padding=(kt//2,0,0),
    groups=dim): identical param tree (kernel [kt,1,1,1,C], bias [C]) and
    exact numerics.  The stencil form (sum of kt shifted T-slices of one
    padded tensor, a single elementwise fusion instead of a 5-D depthwise
    conv) measured a flagship NULL on TPU — 63.1 vs 63.8 clips/s control —
    the decoder's (7,1,1) convs are small enough that the padded-tensor
    slices' extra HBM reads outweigh the conv they replace.  Default is
    therefore the plain conv; MSPI_TDW_STENCIL=1 opts the stencil in
    (kept, with a parity test, for larger temporal-conv shapes where the
    trade can flip).
    """

    dim: int
    kt: int
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, kt = self.dim, self.kt
        w = self.param("kernel", self.kernel_init or torch_kernel_init,
                       (kt, 1, 1, 1, C))
        b = self.param("bias", self.bias_init or torch_bias_init(kt), (C,))
        from flax.linen.dtypes import promote_dtype

        x, w, b = promote_dtype(x, w, b, dtype=default_compute_dtype())
        pt = kt // 2
        if os.environ.get("MSPI_TDW_STENCIL", "0") != "1" or not _s2d_enabled():
            y = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1, 1),
                padding=[(pt, pt), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                feature_group_count=C)
            return y + b
        T = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (pt, pt), (0, 0), (0, 0), (0, 0)))
        y = w[0, 0, 0, 0] * xp[:, 0:T]
        for dt in range(1, kt):
            y = y + w[dt, 0, 0, 0] * xp[:, dt:dt + T]
        return y + b


def dense(in_features: int, features: int, bias: bool = True, dtype=None,
          kernel_init=None, bias_init=None, name: Optional[str] = None) -> nn.Dense:
    """torch nn.Linear equivalent."""
    return nn.Dense(
        features,
        use_bias=bias,
        dtype=dtype if dtype is not None else default_compute_dtype(),
        kernel_init=kernel_init or torch_kernel_init,
        bias_init=bias_init or torch_bias_init(in_features),
        name=name,
    )


class DenseSplit(nn.Module):
    """nn.Dense with an identical param tree (kernel [in, out], bias [out] —
    so torch-weight conversion and TP sharding rules are unchanged) whose
    output is returned lane-split at `splits` boundaries as separate arrays.

    Attention call sites use this to emit q and kv (or q/k/v) as separate
    tensors straight out of the matmul: slicing a fused [.., 3C] output in
    XLA materialises copies on the way into a Pallas kernel, whereas
    slicing the *weight* at trace time is free.
    """

    in_features: int
    features: int
    splits: Tuple[int, ...]
    use_bias: bool = True
    dtype: Any = None
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init or torch_kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias",
                          self.bias_init or torch_bias_init(self.in_features),
                          (self.features,)) if self.use_bias else None
        from flax.linen.dtypes import promote_dtype

        dtype = self.dtype if self.dtype is not None else default_compute_dtype()
        x, kernel, bias = promote_dtype(x, kernel, bias, dtype=dtype)
        outs = []
        lo = 0
        for hi in tuple(self.splits) + (self.features,):
            y = x @ jax.lax.slice_in_dim(kernel, lo, hi, axis=1)
            if bias is not None:
                y = y + bias[lo:hi]
            outs.append(y)
            lo = hi
        return tuple(outs)


def dense_split(in_features: int, features: int, splits: Tuple[int, ...],
                bias: bool = True, dtype=None, kernel_init=None,
                bias_init=None, name: Optional[str] = None) -> DenseSplit:
    """torch nn.Linear whose output is returned pre-split along lanes."""
    return DenseSplit(in_features, features, tuple(splits), use_bias=bias,
                      dtype=dtype, kernel_init=kernel_init,
                      bias_init=bias_init, name=name)


def batchnorm(momentum: float = 0.1, epsilon: float = 1e-5, dtype=None,
              name: Optional[str] = None) -> nn.BatchNorm:
    """torch nn.BatchNorm{1,2,3}d over the trailing channel axis.

    `momentum` is the torch momentum. Call with
    `use_running_average=not train`; running stats live in 'batch_stats'.
    """
    return nn.BatchNorm(
        use_running_average=None,
        momentum=1.0 - momentum,
        epsilon=epsilon,
        dtype=dtype if dtype is not None else default_compute_dtype(),
        name=name,
    )


def layernorm(epsilon: float = 1e-5, dtype=None, name: Optional[str] = None) -> nn.LayerNorm:
    """torch nn.LayerNorm over the trailing axis (eps=1e-5, torch default —
    flax's own default is 1e-6, which breaks parity)."""
    return nn.LayerNorm(
        epsilon=epsilon,
        dtype=dtype if dtype is not None else default_compute_dtype(),
        name=name)


def max_pool(
    x: jnp.ndarray,
    kernel_size: IntOrTuple,
    stride: Optional[IntOrTuple] = None,
    padding: IntOrTuple = 0,
    ndim: int = 3,
) -> jnp.ndarray:
    """torch nn.MaxPool2d/3d: -inf padding, floor output size. x channels-last."""
    n = ndim
    kernel = _to_tuple(kernel_size, n)
    stride_t = _to_tuple(stride if stride is not None else kernel_size, n)
    pad = _to_tuple(padding, n)
    window = (1,) + kernel + (1,)
    strides = (1,) + stride_t + (1,)
    pads = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides, pads)


def avg_pool(
    x: jnp.ndarray,
    kernel_size: IntOrTuple,
    stride: Optional[IntOrTuple] = None,
    padding: IntOrTuple = 0,
    ndim: int = 3,
) -> jnp.ndarray:
    """torch nn.AvgPool (count_include_pad=True, the torch default)."""
    n = ndim
    kernel = _to_tuple(kernel_size, n)
    stride_t = _to_tuple(stride if stride is not None else kernel_size, n)
    pad = _to_tuple(padding, n)
    window = (1,) + kernel + (1,)
    strides = (1,) + stride_t + (1,)
    pads = [(0, 0)] + [(p, p) for p in pad] + [(0, 0)]
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    return summed / math.prod(kernel)


def _upsample_int_axis(x: jnp.ndarray, s: int, ax: int) -> jnp.ndarray:
    """Exact half-pixel linear upsample by integer factor `s` along `ax`.

    For dst = s*k + r the source coordinate is k + f with
    f = (r+0.5)/s - 0.5 in (-0.5, 0.5), so each output phase r is a fixed
    2-tap blend of x with its edge-clamped +-1 shift.  Weights are exact
    binary fractions for power-of-2 s, so this matches the separable
    formula torch uses (Upsample align_corners=False, reference
    model_utils.py:486-488) to fp32 rounding.

    MEASURED NULL (r3, flagship TPU A/B): the stack+reshape interleave
    costs ~7 ms/iter in layout copies — MORE than the dense [out, in]
    dot_generals jax.image.resize emits (51.8 -> 49.6 clips/s).  Gated
    behind MSPI_STENCIL_RESIZE=1 for future re-measurement; the default
    stays on jax.image.resize.
    """
    n = x.shape[ax]
    x_lo = jax.lax.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=ax),
         jax.lax.slice_in_dim(x, 0, n - 1, axis=ax)], ax)
    x_hi = jax.lax.concatenate(
        [jax.lax.slice_in_dim(x, 1, n, axis=ax),
         jax.lax.slice_in_dim(x, n - 1, n, axis=ax)], ax)
    phases = []
    for r in range(s):
        f = (r + 0.5) / s - 0.5
        if f < 0:
            phases.append((-f) * x_lo.astype(jnp.float32)
                          + (1.0 + f) * x.astype(jnp.float32))
        elif f == 0:
            phases.append(x.astype(jnp.float32))
        else:
            phases.append((1.0 - f) * x.astype(jnp.float32)
                          + f * x_hi.astype(jnp.float32))
    stacked = jnp.stack(phases, axis=ax + 1)
    out_shape = x.shape[:ax] + (n * s,) + x.shape[ax + 1:]
    return stacked.reshape(out_shape).astype(x.dtype)


def resize_linear(x: jnp.ndarray, scale: Sequence[float], axes: Sequence[int]) -> jnp.ndarray:
    """Half-pixel linear resize of the given axes by the given scale factors.

    Matches torch nn.Upsample(mode='bilinear'/'trilinear', align_corners=False)
    (used throughout the decoder, reference model_utils.py:486-488).
    MSPI_STENCIL_RESIZE=1 routes integer upscale factors through the
    elementwise stencil path (measured slower on TPU — see
    _upsample_int_axis — kept for re-measurement on future hardware).
    """
    if (os.environ.get("MSPI_STENCIL_RESIZE") == "1"
            and all(float(s).is_integer() and s >= 1 for s in scale)):
        out = x
        for s, ax in zip(scale, axes):
            if int(s) != 1:
                out = _upsample_int_axis(out, int(s), ax)
        return out
    shape = list(x.shape)
    for s, ax in zip(scale, axes):
        shape[ax] = int(math.floor(shape[ax] * s))
    return jax.image.resize(x, tuple(shape), method="linear", antialias=False).astype(x.dtype)


def resize_to(x: jnp.ndarray, sizes: Sequence[int], axes: Sequence[int]) -> jnp.ndarray:
    shape = list(x.shape)
    for size, ax in zip(sizes, axes):
        shape[ax] = int(size)
    return jax.image.resize(x, tuple(shape), method="linear", antialias=False).astype(x.dtype)


def adaptive_avg_pool(x: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """AdaptiveAvgPool to (1,...,1): mean over spatial axes (channels-last),
    keeping dims."""
    axes = tuple(range(1, 1 + ndim))
    return jnp.mean(x, axis=axes, keepdims=True)


# --- Stateless modules usable as Sequential slots (keep index-parity with
# --- the reference's torch nn.Sequential graphs). ---


class ReLU(nn.Module):
    def __call__(self, x):
        return jax.nn.relu(x)


class Sigmoid(nn.Module):
    def __call__(self, x):
        return jax.nn.sigmoid(x)


class GELU(nn.Module):
    def __call__(self, x):
        return gelu(x)


class Identity(nn.Module):
    def __call__(self, x, *a, **k):
        return x


class MaxPool(nn.Module):
    kernel_size: IntOrTuple
    stride: Optional[IntOrTuple] = None
    padding: IntOrTuple = 0
    ndim: int = 3

    def __call__(self, x):
        return max_pool(x, self.kernel_size, self.stride, self.padding, self.ndim)


class Upsample(nn.Module):
    """torch nn.Upsample(scale_factor, mode=trilinear/bilinear,
    align_corners=False) on channels-last tensors. `scale` is per leading
    spatial axis: (t,h,w) for video, (h,w) for images."""

    scale: Sequence[float]

    def __call__(self, x):
        n = len(self.scale)
        if all(s == 1 for s in self.scale):
            return x
        return resize_linear(x, self.scale, tuple(range(1, 1 + n)))


class Sequential(nn.Module):
    """Torch-style Sequential: child i is auto-named layers_i so the generic
    weight converter maps torch 'seq.i.*' -> flax 'seq/layers_i/*'.

    BatchNorm children receive use_running_average=not train.

    `order` optionally applies the children in a different sequence while
    keeping their list-index names (and therefore converter mapping) fixed —
    used to commute adjacent linear ops (e.g. run a strided temporal conv
    before, not after, a spatial upsample: same map, 16x less work).
    """

    layers: Sequence[nn.Module]
    order: Optional[Sequence[int]] = None

    def __call__(self, x, train: bool = False):
        idxs = self.order if self.order is not None else range(len(self.layers))
        for i in idxs:
            x = apply_layer(self.layers[i], x, train)
        return x


class MapConv3d(nn.Module):
    """A (1, kh, kw) conv `in_dim -> 1` that emits [B, T, H, W], contracting
    the channel axis inside the op.  Same map as
    conv3d(in_dim, 1, (1,kh,kw), 1, (0,1,1)) up to fp reassociation, with
    identical param names/shapes so the torch converter is unchanged.

    Why: XLA lays the conv3d version's [B,1,H,W,1] output out lane-padded
    (C=1 -> 128 lanes) and fuses the downstream logsumexp max into the same
    kernel — 6.1 ms/trace on the flagship (r3 profile, fusion.3168).  The
    shifted-einsum form emits a dense [B,T,H,W] (lanes = W) instead."""

    in_dim: int
    kernel_hw: Sequence[int] = (3, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_hw
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, kh, kw, self.in_dim, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        w = kernel.astype(x.dtype)[0, ..., 0]  # [kh, kw, C]
        B, T, H, W, C = x.shape
        xp = jnp.pad(x, ((0, 0), (0, 0), (kh // 2, kh // 2),
                         (kw // 2, kw // 2), (0, 0)))
        out = None
        for dy in range(kh):
            for dx in range(kw):
                t = jnp.einsum("bthwc,c->bthw",
                               xp[:, :, dy:dy + H, dx:dx + W, :], w[dy, dx])
                out = t if out is None else out + t
        return out + bias.astype(x.dtype)[0]


def apply_layer(layer, x, train: bool):
    if isinstance(layer, nn.BatchNorm):
        return layer(x, use_running_average=not train)
    try:
        return layer(x, train=train)
    except TypeError:
        return layer(x)


def drop_path_fn(rng, x: jnp.ndarray, rate, deterministic: bool) -> jnp.ndarray:
    """Functional stochastic depth; `rate` may be a traced scalar (e.g. a
    scanned per-block rate)."""
    if deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    # a traced `rate` is fp32: dividing by it would promote a bf16 residual
    # stream to fp32 (same leak class as the ConvNeXt gamma fix)
    inv = jnp.asarray(1.0 / keep, x.dtype)
    return jnp.where(mask, x * inv, jnp.zeros_like(x))


class DropPath(nn.Module):
    """Stochastic depth per sample (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
