"""Pallas fused window attention for TPU — forward and backward.

Used by the VideoSwin backbone (3-D shifted windows: N = 8*7*7 = 392 tokens,
head_dim 32) and reusable for any attention whose per-window score matrix
fits VMEM (reference backbones/video_swin_transformer.py:108-190).

The kernel consumes the **packed qkv tensor** [B_, N, 3C] exactly as the
qkv dense emits it (lane order 3 -> head -> head_dim, the torch
``.reshape(B, N, 3, H, D)`` convention) and writes [B_, N, C] exactly as
the proj dense consumes it.  This is the load-bearing design choice on
TPU: the per-head [B_, H, N, 32] layout that a literal translation would
use pads the 32-wide minor dim to the 128-lane tile (4x DMA amplification
on q, k, v and out) and needs slice+transpose copies on both sides of the
kernel — profiled at ~30% of the VideoSwin step.  Heads are unrolled
*inside* the kernel as static lane slices of the packed block instead.

Grid = one step per group of WB windows (WB chosen against the VMEM
budget); the relative-position bias [H, N, N] has a constant index map so
it stays VMEM-resident across the whole grid, and the shift mask rides
along per window-group.  Scores/softmax accumulate in fp32; matmul
operands stay in the storage dtype (native-rate bf16 MXU).

Backward: a packed Pallas kernel on the same grid recomputes probs per
(window, head), writes dqkv [B_, N, 3C], and accumulates the bias
cotangent into a VMEM-resident fp32 [H, N, N] block (constant index map,
sequential grid).  When H*N*N fp32 + the packed blocks exceed VMEM
(VideoSwin stages 3/4: 12/24 heads), the backward falls back to the
per-head-layout kernel (`_bwd_impl_perhead`) around explicit layout
conversion — the conversion copies return on the training path only.

Falls back to the jnp path automatically off-TPU (mspi_tpu.ops.pallas
.pallas_enabled).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _softmax(scores):
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def _sub_pad(n: int) -> int:
    return -(-n // 8) * 8


# --------------------------------------------------------------------------
# packed-qkv kernels
# --------------------------------------------------------------------------


def _packed_fwd_kernel(qkv_ref, bias_ref, mask_ref, out_ref, *,
                       heads, wb, scale):
    C = out_ref.shape[-1]
    D = C // heads
    for w in range(wb):
        row = qkv_ref[w]  # [N, 3C]
        m = None if mask_ref is None else mask_ref[w].astype(jnp.float32)
        for h in range(heads):
            q = row[:, h * D:(h + 1) * D] * row.dtype.type(scale)
            k = row[:, C + h * D:C + (h + 1) * D]
            v = row[:, 2 * C + h * D:2 * C + (h + 1) * D]
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [N, N]
            scores = scores + bias_ref[h].astype(jnp.float32)
            if m is not None:
                scores = scores + m
            probs = _softmax(scores)
            out = jnp.dot(probs.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
            out_ref[w, :, h * D:(h + 1) * D] = out.astype(out_ref.dtype)


def _packed_bwd_kernel(qkv_ref, bias_ref, mask_ref, do_ref,
                       dqkv_ref, dbias_ref, *, heads, wb, scale):
    g = pl.program_id(0)
    C = do_ref.shape[-1]
    D = C // heads
    for h in range(heads):
        ds_sum = None
        for w in range(wb):
            row = qkv_ref[w]
            q = row[:, h * D:(h + 1) * D]
            k = row[:, C + h * D:C + (h + 1) * D]
            v = row[:, 2 * C + h * D:2 * C + (h + 1) * D]
            do = do_ref[w, :, h * D:(h + 1) * D]
            qs = q * row.dtype.type(scale)
            scores = jax.lax.dot_general(
                qs, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = scores + bias_ref[h].astype(jnp.float32)
            if mask_ref is not None:
                scores = scores + mask_ref[w].astype(jnp.float32)
            probs = _softmax(scores)  # [N, N] fp32
            p = probs.astype(v.dtype)

            dv = jax.lax.dot_general(  # P^T dO
                p, do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(  # dO V^T
                do, v, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
            ds_c = ds.astype(q.dtype)
            dq = scale * jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(  # dS^T (q*scale)
                ds_c, qs, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

            dqkv_ref[w, :, h * D:(h + 1) * D] = dq.astype(dqkv_ref.dtype)
            dqkv_ref[w, :, C + h * D:C + (h + 1) * D] = dk.astype(dqkv_ref.dtype)
            dqkv_ref[w, :, 2 * C + h * D:2 * C + (h + 1) * D] = \
                dv.astype(dqkv_ref.dtype)
            ds_sum = ds if ds_sum is None else ds_sum + ds

        @pl.when(g == 0)
        def _init():
            dbias_ref[h] = ds_sum

        @pl.when(g != 0)
        def _acc():
            dbias_ref[h] = dbias_ref[h] + ds_sum


def _packed_fwd_vmem(wb, N, C, heads, itemsize, masked, bias_itemsize):
    """Per-step VMEM estimate for the packed forward (double-buffered in/out
    blocks + resident bias + fp32 score temporaries)."""
    Np = _sub_pad(N)
    qkv = wb * Np * _lane_pad(3 * C) * itemsize * 2
    out = wb * Np * _lane_pad(C) * itemsize * 2
    bias = heads * Np * _lane_pad(N) * bias_itemsize
    mask = wb * Np * _lane_pad(N) * itemsize * 2 if masked else 0
    temps = 3 * Np * _lane_pad(N) * 4
    return qkv + out + bias + mask + temps


def _packed_bwd_vmem(wb, N, C, heads, itemsize, masked, bias_itemsize):
    Np = _sub_pad(N)
    qkv = wb * Np * _lane_pad(3 * C) * itemsize * 2 * 2  # in + dqkv out
    do = wb * Np * _lane_pad(C) * itemsize * 2
    bias = heads * Np * _lane_pad(N) * bias_itemsize
    dbias = heads * Np * _lane_pad(N) * 4
    mask = wb * Np * _lane_pad(N) * itemsize * 2 if masked else 0
    temps = 5 * Np * _lane_pad(N) * 4
    return qkv + do + bias + dbias + mask + temps


def _pick_wb(B, nW, masked, fits) -> int:
    """Largest window-group that divides B (and nW when masked, so each
    group's mask rows are one contiguous block) and fits the VMEM budget."""
    for wb in (16, 8, 4, 2, 1):
        if B % wb:
            continue
        if masked and nW % wb:
            continue
        if fits(wb):
            return wb
    return 1


def _budget() -> int:
    return int(os.environ.get("MSPI_ATTN_VMEM_BUDGET", 12 * 1024 * 1024))


def packed_window_attention_fits(N: int, C: int, heads: int,
                                 itemsize: int, masked: bool,
                                 bias_itemsize: int) -> bool:
    """Caller-side gate: can the packed forward run at WB=1 within VMEM?
    The limit (default 17 MB) is deliberately looser than the WB-selection
    budget: the estimator double-counts conservatively, and the largest
    production shape it admits — VideoSwin stage 4 bf16, 24 resident bias
    heads, estimated 16.8 MB — is measured to compile and run on v5e.
    fp32 stage 4 (~33 MB) correctly falls back to the jnp path."""
    limit = int(os.environ.get("MSPI_ATTN_FWD_VMEM_LIMIT",
                               17 * 1024 * 1024))
    return _packed_fwd_vmem(1, N, C, heads, itemsize, masked,
                            bias_itemsize) <= limit


def _packed_fwd_impl(qkv, bias, mask, heads, num_windows, interpret):
    B, N, C3 = qkv.shape
    C = C3 // 3
    scale = (C // heads) ** -0.5
    masked = mask is not None
    fits = functools.partial(
        _packed_fwd_vmem, N=N, C=C, heads=heads, itemsize=qkv.dtype.itemsize,
        masked=masked, bias_itemsize=bias.dtype.itemsize)
    wb = _pick_wb(B, num_windows, masked, lambda w: fits(w) <= _budget())
    in_specs = [
        pl.BlockSpec((wb, N, C3), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, N, N), lambda g: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias]
    if masked:
        in_specs.append(pl.BlockSpec(
            (wb, N, N), lambda g, _n=num_windows // wb: (g % _n, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_packed_fwd_kernel, heads=heads, wb=wb,
                                   scale=scale)
    else:
        def kernel(qkv_ref, bias_ref, out_ref):
            _packed_fwd_kernel(qkv_ref, bias_ref, None, out_ref,
                               heads=heads, wb=wb, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B // wb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, N, C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), qkv.dtype),
        interpret=interpret,
    )(*args)


def _packed_bwd_impl(qkv, bias, mask, do, heads, num_windows, interpret, wb):
    B, N, C3 = qkv.shape
    C = C3 // 3
    scale = (C // heads) ** -0.5
    masked = mask is not None
    in_specs = [
        pl.BlockSpec((wb, N, C3), lambda g: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((heads, N, N), lambda g: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv, bias]
    if masked:
        in_specs.append(pl.BlockSpec(
            (wb, N, N), lambda g, _n=num_windows // wb: (g % _n, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_packed_bwd_kernel, heads=heads, wb=wb,
                                   scale=scale)
    else:
        def kernel(qkv_ref, bias_ref, do_ref, dqkv_ref, dbias_ref):
            _packed_bwd_kernel(qkv_ref, bias_ref, None, do_ref,
                               dqkv_ref, dbias_ref, heads=heads, wb=wb,
                               scale=scale)
    in_specs.append(pl.BlockSpec((wb, N, C), lambda g: (g, 0, 0),
                                 memory_space=pltpu.VMEM))
    args.append(do)
    dqkv, dbias = pl.pallas_call(
        kernel,
        grid=(B // wb,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((wb, N, C3), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            # constant index map -> resident fp32 accumulator, flushed once
            pl.BlockSpec((heads, N, N), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C3), qkv.dtype),
            jax.ShapeDtypeStruct((heads, N, N), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dqkv, dbias.astype(bias.dtype)


# --------------------------------------------------------------------------
# per-head-layout backward (stages whose resident dbias would blow VMEM)
# --------------------------------------------------------------------------


def _perhead_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                        dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    """One (head, window) grid step.  Grid is (H, B) with B fastest so the
    dbias block (indexed by head only) is revisited on consecutive
    iterations — the Pallas accumulation-safe pattern."""
    b = pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    scores = jax.lax.dot_general(
        (q * q.dtype.type(scale)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = scores + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        scores = scores + mask_ref[0].astype(jnp.float32)
    probs = _softmax(scores)  # [N, N]
    p = probs.astype(v.dtype)

    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_c = ds.astype(q.dtype)
    dq = scale * jnp.dot(ds_c, k, preferred_element_type=jnp.float32)
    dk = scale * jax.lax.dot_general(
        ds_c, q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(b == 0)
    def _init():
        dbias_ref[0] = ds

    @pl.when(b != 0)
    def _acc():
        dbias_ref[0] = dbias_ref[0] + ds


def _bwd_impl_perhead(q, k, v, bias, mask, do, num_windows, interpret):
    B, H, N, D = q.shape
    scale = D ** -0.5
    qkv_spec = pl.BlockSpec((1, 1, N, D), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec(
            (1, N, N), lambda h, b: (b % num_windows, 0, 0),
            memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_perhead_bwd_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, dbias_ref):
            _perhead_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, None, do_ref,
                                dq_ref, dk_ref, dv_ref, dbias_ref,
                                scale=scale)
    args.append(do)
    in_specs.append(qkv_spec)

    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(H, B),
        in_specs=in_specs,
        out_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return dq, dk, dv, dbias.astype(bias.dtype)


# --------------------------------------------------------------------------
# public custom_vjp entry point
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _window_attention(qkv, bias, mask, heads, num_windows, interpret):
    return _packed_fwd_impl(qkv, bias, mask, heads, num_windows, interpret)


def _window_attention_fwd(qkv, bias, mask, heads, num_windows, interpret):
    out = _packed_fwd_impl(qkv, bias, mask, heads, num_windows, interpret)
    return out, (qkv, bias, mask)


def _window_attention_bwd(heads, num_windows, interpret, res, do):
    qkv, bias, mask = res
    B, N, C3 = qkv.shape
    C = C3 // 3
    masked = mask is not None
    fits = functools.partial(
        _packed_bwd_vmem, N=N, C=C, heads=heads, itemsize=qkv.dtype.itemsize,
        masked=masked, bias_itemsize=bias.dtype.itemsize)
    wb = _pick_wb(B, num_windows, masked, lambda w: fits(w) <= _budget())
    if fits(wb) <= _budget():
        dqkv, dbias = _packed_bwd_impl(qkv, bias, mask, do, heads,
                                       num_windows, interpret, wb)
    else:
        # resident fp32 dbias does not fit (many-head stages): per-head
        # layout conversion + the (H, B)-grid kernel
        D = C // heads
        split = qkv.reshape(B, N, 3, heads, D).transpose(2, 0, 3, 1, 4)
        q, k, v = split[0], split[1], split[2]
        doh = do.reshape(B, N, heads, D).transpose(0, 2, 1, 3)
        dq, dk, dv, dbias = _bwd_impl_perhead(q, k, v, bias, mask, doh,
                                              num_windows, interpret)
        dqkv = jnp.stack([dq, dk, dv], axis=0).transpose(1, 3, 0, 2, 4)
        dqkv = dqkv.reshape(B, N, C3)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias, dmask


_window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


@functools.partial(jax.jit,
                   static_argnames=("num_heads", "num_windows", "interpret"))
def fused_window_attention(
    qkv: jnp.ndarray,          # [B, N, 3C] packed, lane order (3, head, D)
    bias: jnp.ndarray,         # [H, N, N] relative-position bias
    mask: Optional[jnp.ndarray] = None,  # [nW, N, N] shift mask or None
    *,
    num_heads: int,
    num_windows: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(D) + bias [+ mask]) v per window, consuming the
    packed qkv projection and returning [B, N, C]."""
    return _window_attention(qkv, bias, mask, num_heads, num_windows,
                             interpret)
