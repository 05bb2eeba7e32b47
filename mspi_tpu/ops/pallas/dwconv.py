"""Pallas stride-1 depthwise conv3d — measured NULL, kept opt-in.

Motivation: the r3 flagship profile attributed 4.3 ms/iter (0.42 TFLOP/s)
to the MViT stage-1 q-pool conv (bf16[8,8,56,96,96], 3x3x3 s1, reference
backbones/MViT.py:1066-1136 pool mode "conv").  Outcome
(tools/bench_dwconv3d.py, real chip): **in isolation XLA runs that conv
at 3.42 TFLOP/s (0.52 ms)** — the profile's 4.3 ms is a layout/fusion
artifact of the surrounding graph, not the conv op — and this kernel
reaches only 0.61 TFLOP/s (serialized slab DMAs + sublane-unaligned tap
slices), so routing the pools through it regressed the flagship 63.7 ->
60.2 clips/s.  Gated behind MSPI_DWCONV=1; any future win here is layout
surgery around the pool, not a custom conv.

Design (for reference): one grid step = one (batch, t) output slab
[H, W, C]; the input stays in HBM (memory_space=ANY) and the kt
overlapping temporal slabs are hand-DMA'd into a single-buffered VMEM
scratch (BlockSpec pipelining double-buffers, which blew the 16 MB scoped
VMEM at stage 1); kh*kw spatial taps are static slices accumulated in
fp32; DMA extents must be (8, 128)-tile aligned, hence the W/C padding.
Backward: dx is the same conv with flipped weights (reuses the kernel);
dw/db come from XLA's conv weight-grad.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w_ref, out_ref, slabs, sems, *, kt, kh, kw, H, W):
    # xp_ref stays in HBM (memory_space=ANY); the kt overlapping temporal
    # slabs are DMA'd into a single-buffered VMEM scratch by hand —
    # BlockSpec-pipelined inputs are double-buffered by Mosaic, which blew
    # the 16 MB scoped-VMEM limit at the stage-1 shape (17.08 M measured).
    # The kt-x slab re-fetch per step costs ~0.2 ms of extra HBM reads at
    # stage 1 — noise next to the 4.3 ms conv it replaces.
    b = pl.program_id(0)
    t = pl.program_id(1)
    for dt in range(kt):
        pltpu.make_async_copy(xp_ref.at[b, t + dt], slabs.at[dt],
                              sems.at[dt]).start()
    for dt in range(kt):
        pltpu.make_async_copy(xp_ref.at[b, t + dt], slabs.at[dt],
                              sems.at[dt]).wait()
    acc = None
    for dt in range(kt):
        slab = slabs[dt]  # [Hp, Wp8, C128] (DMA-tile-aligned)
        for dh in range(kh):
            for dw in range(kw):
                tap = slab[dh:dh + H, dw:dw + W, :].astype(jnp.float32)
                wv = w_ref[(dt * kh + dh) * kw + dw].astype(jnp.float32)
                term = tap * wv[None, None, :]
                acc = term if acc is None else acc + term
    C = out_ref.shape[-1]
    out_ref[0, 0] = acc[:, :, :C].astype(out_ref.dtype)


def _vmem_bytes(kt, kh, kw, H, W, C, itemsize) -> int:
    """Per-step footprint: kt single-buffered input slabs (lane-padded)
    + fp32 accumulator and one live temporary + double-buffered output."""
    cpad = -(-C // 128) * 128
    wp8 = -(-(W + kw - 1) // 8) * 8
    slabs = kt * (H + kh - 1) * wp8 * cpad * itemsize
    acc = 2 * H * W * cpad * 4
    out = H * W * cpad * itemsize * 2
    return slabs + acc + out


def dwconv3d_supported(shape, kernel, stride) -> bool:
    """True when the fused kernel applies: stride 1, odd kernel, and the
    working set fits scoped VMEM."""
    if tuple(stride) != (1, 1, 1):
        return False
    kt, kh, kw = kernel
    if kt % 2 == 0 or kh % 2 == 0 or kw % 2 == 0:
        return False
    B, T, H, W, C = shape
    # 15 MB: the flagship stage-1 slab set computes to ~14.2 MB and runs
    # (v5e scoped VMEM is ~16 MB); shapes beyond that fall back to XLA.
    limit = int(os.environ.get("MSPI_DWCONV_VMEM_LIMIT", 15 * 1024 * 1024))
    return _vmem_bytes(kt, kh, kw, H, W, C, 2) <= limit


def _impl(xp, wf, kt, kh, kw, H, W, C, out_dtype, interpret):
    B = xp.shape[0]
    T = xp.shape[1] - (kt - 1)
    # Wp / Cp are rounded up to the (8, 128) tile: the manual DMA slices
    # the HBM tensor along (b, t) and must take dims 2..4 at full,
    # tile-aligned extents ("slice shape along dimension N must be aligned
    # to tiling").  C is the real channel count of the output.
    Hp, Wp, Cp = H + kh - 1, xp.shape[3], xp.shape[4]
    return pl.pallas_call(
        functools.partial(_kernel, kt=kt, kh=kh, kw=kw, H=H, W=W),
        grid=(B, T),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xp stays in HBM
            pl.BlockSpec((kt * kh * kw, Cp), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W, C), lambda b, t: (b, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, H, W, C), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((kt, Hp, Wp, Cp), xp.dtype),
            pltpu.SemaphoreType.DMA((kt,)),
        ],
        interpret=interpret,
    )(xp, wf)


def _xla_conv(x, w):
    C = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1, 1),
        padding=[(k // 2, k // 2) for k in w.shape[:3]],
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        feature_group_count=C)


def _fwd_impl(x, w, interpret):
    kt, kh, kw = w.shape[:3]
    B, T, H, W, C = x.shape
    extra_w = -(W + kw - 1) % 8    # sublane-align the DMA'd W extent
    extra_c = -C % 128             # lane-align the DMA'd C extent
    xp = jnp.pad(x, ((0, 0), (kt // 2, kt // 2), (kh // 2, kh // 2),
                     (kw // 2, kw // 2 + extra_w), (0, extra_c)))
    wf = jnp.pad(w.reshape(kt * kh * kw, C), ((0, 0), (0, extra_c)))
    return _impl(xp, wf, kt, kh, kw, H, W, C, x.dtype, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dwconv3d(x, w, interpret):
    return _fwd_impl(x, w, interpret)


def _dwconv3d_fwd(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


def _dwconv3d_bwd(interpret, res, dy):
    x, w = res
    # dx: same stride-1 SAME depthwise conv with spatially flipped weights.
    dx = _fwd_impl(dy, jnp.flip(w, axis=(0, 1, 2)).astype(dy.dtype),
                   interpret)
    # dw: small [kt,kh,kw,1,C]; XLA's conv weight-grad handles it well.
    _, vjp = jax.vjp(lambda w_: _xla_conv(x, w_), w)
    (dw,) = vjp(dy.astype(x.dtype))
    return dx.astype(x.dtype), dw


_dwconv3d.defvjp(_dwconv3d_fwd, _dwconv3d_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_dwconv3d(
    x: jnp.ndarray,  # [B, T, H, W, C] (NDHWC)
    w: jnp.ndarray,  # [kt, kh, kw, 1, C] (DHWIO, depthwise)
    interpret: bool = False,
) -> jnp.ndarray:
    """Stride-1 SAME depthwise conv3d with the receptive field resident in
    VMEM.  Caller must check dwconv3d_supported() first (odd kernel,
    stride 1, VMEM fit); no bias (the MViT pool convs carry none)."""
    return _dwconv3d(x, w, interpret)
