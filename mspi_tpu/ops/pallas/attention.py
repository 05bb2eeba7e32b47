"""Pallas fused window attention for TPU.

Used by the VideoSwin backbone (3-D shifted windows: N = 8*7*7 = 392 tokens,
head_dim 32) and reusable for any attention whose per-(batch,head) score
matrix fits VMEM.  XLA materialises the [B*nW, heads, N, N] attention tensor
in HBM between the two matmuls (~200 MB per Swin stage at 224x384); this
kernel keeps scores entirely in VMEM: one grid step = one (window, head)
pair computing  softmax(q k^T * scale + rel_bias [+ shift_mask]) v  with an
fp32 softmax, writing only the [N, D] output.

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


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)  # [N, D]
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q * scale, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [N, N]
    scores = scores + bias_ref[0].astype(jnp.float32)
    if mask_ref is not None:
        scores = scores + mask_ref[0].astype(jnp.float32)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.dot(probs, v, preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


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
    B, H, N, D = q.shape
    scale = D ** -0.5

    in_specs = [
        pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.ANY
                     if False else pltpu.VMEM),
        pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if mask is not None:
        in_specs.append(
            pl.BlockSpec((1, N, N), lambda b, h: (b % num_windows, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(mask)
        kernel = functools.partial(_attn_kernel, scale=scale)
    else:
        def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
            _attn_kernel(q_ref, k_ref, v_ref, bias_ref, None, out_ref, scale=scale)

    return pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=interpret,
    )(*args)
