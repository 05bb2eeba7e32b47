"""Pallas fused window attention for TPU — forward and backward.

Used by the VideoSwin backbone (3-D shifted windows: N = 8*7*7 = 392 tokens,
head_dim 32) and reusable for any attention whose per-(batch,head) score
matrix fits VMEM.  XLA materialises the [B*nW, heads, N, N] attention tensor
in HBM between the two matmuls (~200 MB per Swin stage at 224x384); this
kernel keeps scores entirely in VMEM: one grid step = one (window, head)
pair computing  softmax(q k^T * scale + rel_bias [+ shift_mask]) v  with an
fp32 softmax, writing only the [N, D] output.

Training support: `fused_window_attention` carries a `jax.custom_vjp` whose
backward is itself a Pallas kernel (recompute probs in VMEM, then
dv = P^T dO, dS = P*(dO V^T - rowsum), dq = dS K, dk = dS^T Q, with the
relative-position-bias gradient accumulated across windows inside the
grid).  The shift mask is an additive constant (non-trainable); its
cotangent is zero.

Falls back to the jnp path automatically off-TPU (mspi_tpu.ops.pallas
.pallas_enabled).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scores(q, k, bias_ref, mask_ref, *, scale):
    scores = jax.lax.dot_general(
        (q * q.dtype.type(scale)), k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [N, N]
    scores = scores + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        scores = scores + mask_ref[0].astype(jnp.float32)
    return scores


def _softmax(scores):
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    return probs / jnp.sum(probs, axis=-1, keepdims=True)


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale):
    # operands stay in storage dtype (native-rate MXU on bf16); fp32 accum
    q = q_ref[0, 0]  # [N, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    probs = _softmax(_scores(q, k, bias_ref, mask_ref, scale=scale))
    out = jnp.dot(probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dbias_ref, *, scale):
    """One (head, window) grid step of the backward.

    Grid is (H, B) with B fastest so the dbias block (indexed by head only)
    is revisited on consecutive iterations — the Pallas accumulation-safe
    pattern (like the k-last matmul reduction).
    """
    b = pl.program_id(1)
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    probs = _softmax(_scores(q, k, bias_ref, mask_ref, scale=scale))  # [N, N]
    p = probs.astype(v.dtype)

    # dv = P^T dO
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))
    ds_c = ds.astype(q.dtype)
    # dq = scale * dS K ; dk = scale * dS^T Q
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


def _specs(B, H, N, D, num_windows, with_mask):
    qkv = pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    bias = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0),
                        memory_space=pltpu.VMEM)
    specs = [qkv, qkv, qkv, bias]
    if with_mask:
        specs.append(pl.BlockSpec((1, N, N), lambda b, h: (b % num_windows, 0, 0),
                                  memory_space=pltpu.VMEM))
    return specs


def _fwd_impl(q, k, v, bias, mask, num_windows, interpret):
    B, H, N, D = q.shape
    scale = D ** -0.5
    args = [q, k, v, bias] + ([mask] if mask is not None else [])
    if mask is not None:
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref,
                         scale=scale)
    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=_specs(B, H, N, D, num_windows, mask is not None),
        out_specs=pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=interpret,
    )(*args)


def _bwd_impl(q, k, v, bias, mask, do, num_windows, interpret):
    B, H, N, D = q.shape
    scale = D ** -0.5
    # grid (H, B): B fastest → consecutive revisits of each head's dbias block
    qkv = pl.BlockSpec((1, 1, N, D), lambda h, b: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [qkv, qkv, qkv, bias_spec]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(pl.BlockSpec((1, N, N),
                                     lambda h, b: (b % num_windows, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, dbias_ref):
            _attn_bwd_kernel(q_ref, k_ref, v_ref, bias_ref, None, do_ref,
                             dq_ref, dk_ref, dv_ref, dbias_ref, scale=scale)
    args.append(do)
    in_specs.append(qkv)

    dq, dk, dv, dbias = pl.pallas_call(
        kernel,
        grid=(H, B),
        in_specs=in_specs,
        out_specs=[
            qkv, qkv, qkv,
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _window_attention(q, k, v, bias, mask, num_windows, interpret):
    return _fwd_impl(q, k, v, bias, mask, num_windows, interpret)


def _window_attention_fwd(q, k, v, bias, mask, num_windows, interpret):
    out = _fwd_impl(q, k, v, bias, mask, num_windows, interpret)
    return out, (q, k, v, bias, mask)


def _window_attention_bwd(num_windows, interpret, res, do):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_impl(q, k, v, bias, mask, do, num_windows,
                                  interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias, dmask


_window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


@functools.partial(jax.jit, static_argnames=("num_windows", "interpret"))
def fused_window_attention(
    q: jnp.ndarray,            # [B, H, N, D]  (B = batch * num_windows)
    k: jnp.ndarray,            # [B, H, N, D]
    v: jnp.ndarray,            # [B, H, N, D]
    bias: jnp.ndarray,         # [H, N, N] relative-position bias
    mask: Optional[jnp.ndarray] = None,  # [nW, N, N] shift mask or None
    num_windows: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    return _window_attention(q, k, v, bias, mask, num_windows, interpret)
