"""Pallas fused window attention: correctness vs the jnp reference path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.ops.pallas.attention import fused_window_attention


def reference_attention(q, k, v, bias, mask, num_windows):
    B, H, N, D = q.shape
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * (D ** -0.5), k) + bias[None]
    if mask is not None:
        attn = attn.reshape(B // num_windows, num_windows, H, N, N) + mask[None, :, None]
        attn = attn.reshape(B, H, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def test_fused_window_attention_matches_reference(rng):
    B, H, N, D = 4, 3, 56, 32  # nW=2 windows x batch 2
    nW = 2
    q = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0).astype(np.float32))

    ref = reference_attention(q, k, v, bias, mask, nW)
    out = fused_window_attention(q, k, v, bias, mask, num_windows=nW,
                                 interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-5, rtol=1e-4)

    ref_nm = reference_attention(q, k, v, bias, None, nW)
    out_nm = fused_window_attention(q, k, v, bias, None, interpret=True)
    np.testing.assert_allclose(np.array(out_nm), np.array(ref_nm), atol=2e-5,
                               rtol=1e-4)


def test_fused_window_attention_grads_match_reference(rng):
    """Backward (Pallas custom_vjp kernel) vs jax.grad through the jnp path."""
    B, H, N, D = 4, 2, 24, 16
    nW = 2
    q = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, N, D)).astype(np.float32))

    for m in (mask, None):
        def loss_ref(q, k, v, bias):
            return jnp.sum(reference_attention(q, k, v, bias, m, nW) * w)

        def loss_pl(q, k, v, bias):
            return jnp.sum(fused_window_attention(
                q, k, v, bias, m, num_windows=nW, interpret=True) * w)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
        g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b, name in zip(g_ref, g_pl, ("dq", "dk", "dv", "dbias")):
            np.testing.assert_allclose(np.array(b), np.array(a), atol=5e-4,
                                       rtol=1e-3, err_msg=name)
