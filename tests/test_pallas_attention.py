"""Pallas fused window attention: correctness vs the jnp reference path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.ops.pallas.attention import fused_window_attention


def reference_attention_packed(qkv, bias, mask, num_heads, num_windows):
    B, N, C3 = qkv.shape
    C = C3 // 3
    D = C // num_heads
    split = qkv.reshape(B, N, 3, num_heads, D)
    q, k, v = split[:, :, 0], split[:, :, 1], split[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * (D ** -0.5), k) + bias[None]
    if mask is not None:
        attn = attn.reshape(B // num_windows, num_windows, num_heads, N, N) \
            + mask[None, :, None]
        attn = attn.reshape(B, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)


def test_fused_window_attention_matches_reference(rng):
    B, H, N, D = 4, 3, 56, 32  # nW=2 windows x batch 2
    nW = 2
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0).astype(np.float32))

    ref = reference_attention_packed(qkv, bias, mask, H, nW)
    out = fused_window_attention(qkv, bias, mask, num_heads=H, num_windows=nW,
                                 interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-5, rtol=1e-4)

    ref_nm = reference_attention_packed(qkv, bias, None, H, nW)
    out_nm = fused_window_attention(qkv, bias, None, num_heads=H,
                                    interpret=True)
    np.testing.assert_allclose(np.array(out_nm), np.array(ref_nm), atol=2e-5,
                               rtol=1e-4)


def test_fused_window_attention_grads_match_reference(rng, monkeypatch):
    """Backward (Pallas custom_vjp kernel) vs jax.grad through the jnp path —
    both the packed-dbias kernel and the per-head fallback (forced via a tiny
    VMEM budget)."""
    B, H, N, D = 4, 2, 24, 16
    nW = 2
    qkv = jnp.asarray(rng.standard_normal((B, N, 3 * H * D)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((H, N, N)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, N, H * D)).astype(np.float32))

    for budget in (None, "200000"):  # default -> packed bwd; tiny -> per-head
        if budget is None:
            monkeypatch.delenv("MSPI_ATTN_VMEM_BUDGET", raising=False)
        else:
            monkeypatch.setenv("MSPI_ATTN_VMEM_BUDGET", budget)
        for m in (mask, None):
            def loss_ref(qkv, bias):
                return jnp.sum(
                    reference_attention_packed(qkv, bias, m, H, nW) * w)

            def loss_pl(qkv, bias):
                return jnp.sum(fused_window_attention(
                    qkv, bias, m, num_heads=H, num_windows=nW,
                    interpret=True) * w)

            g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
            g_pl = jax.grad(loss_pl, argnums=(0, 1))(qkv, bias)
            for a, b, name in zip(g_ref, g_pl, ("dqkv", "dbias")):
                np.testing.assert_allclose(np.array(b), np.array(a),
                                           atol=5e-4, rtol=1e-3, err_msg=name)


# ---- pooled attention (MViT flagship path) ----

from mspi_tpu.ops.pallas.pooled_attention import fused_attention


def _ref_attention(q, k, v):
    attn = jax.nn.softmax(jnp.einsum("bhnd,bhmd->bhnm", q, k), axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, v)


def test_fused_pooled_attention_matches_reference(rng):
    B, H, Nq, Nk, Da, Dv = 2, 2, 256, 40, 48, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, Da)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, Da)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, Dv)).astype(np.float32))
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_attention(q, k, v)),
                               atol=2e-5)


def test_fused_pooled_attention_ragged_nq(rng):
    # Nq=72 forces the q-padding path (not a multiple of any tile size)
    B, H, Nq, Nk, D = 1, 2, 72, 24, 16
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    out = fused_attention(q, k, v, interpret=True)
    assert out.shape == (B, H, Nq, D)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_attention(q, k, v)),
                               atol=2e-5)


def test_fused_pooled_attention_grads_match_reference(rng):
    B, H, Nq, Nk, D = 1, 2, 128, 24, 16
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))

    g_f = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, interpret=True) * w), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda q, k, v: jnp.sum(
        _ref_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mvit_rel_pos_augmentation_parity(rng):
    """softmax(q_aug k_aug^T) v == the jnp rel-pos bias path: the one-hot
    lane augmentation reproduces cal_rel_pos_{spatial,temporal} exactly."""
    from mspi_tpu.models.mvit import (augment_for_fused_attn,
                                      cal_rel_pos_spatial,
                                      cal_rel_pos_temporal)

    B, H, D = 2, 2, 16
    q_shape, k_shape = (4, 6, 8), (2, 3, 4)
    Nq, Nk = np.prod(q_shape), np.prod(k_shape)
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    rel_t = jnp.asarray(rng.standard_normal(
        (2 * max(q_shape[0], k_shape[0]) - 1, D)).astype(np.float32))
    dh = 2 * max(q_shape[1], k_shape[1]) - 1
    dw = 2 * max(q_shape[2], k_shape[2]) - 1
    rel_h = jnp.asarray(rng.standard_normal((dh, D)).astype(np.float32))
    rel_w = jnp.asarray(rng.standard_normal((dw, D)).astype(np.float32))

    scale = D ** -0.5
    attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k)
    attn = cal_rel_pos_spatial(attn, q, q_shape, k_shape, rel_h, rel_w)
    attn = cal_rel_pos_temporal(attn, q, q_shape, k_shape, rel_t)
    ref = jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(attn, -1), v)

    q_aug, k_aug = augment_for_fused_attn(q, k, q_shape, k_shape, scale,
                                          rel_pos_t=rel_t, rel_pos_h=rel_h,
                                          rel_pos_w=rel_w)
    out = fused_attention(q_aug, k_aug, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_mvit_module_fused_path_matches_jnp(rng, monkeypatch):
    """Full MultiScaleAttention module through the Pallas path
    (MSPI_PALLAS_INTERPRET=1) == the jnp rel-pos path: integration of
    gating + augmentation + kernel inside the real module."""
    from mspi_tpu.models.mvit import MultiScaleAttention

    attn = MultiScaleAttention(
        dim=32, dim_out=32, input_size=(4, 8, 8), num_heads=2, qkv_bias=True,
        kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3), stride_q=(1, 1, 1),
        stride_kv=(1, 2, 2))
    x = jnp.asarray(rng.standard_normal((2, 4 * 8 * 8, 32)).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x, (4, 8, 8))

    out_ref, thw_ref = attn.apply(variables, x, (4, 8, 8))
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out_pl, thw_pl = attn.apply(variables, x, (4, 8, 8))
    assert thw_ref == thw_pl
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=3e-5)


def test_videoswin_window_attention_fused_path_matches_jnp(rng, monkeypatch):
    """WindowAttention3D module through the packed-qkv Pallas path
    (MSPI_PALLAS_INTERPRET=1) == the jnp einsum path, with and without a
    shift mask."""
    from mspi_tpu.models.videoswin import WindowAttention3D

    attn = WindowAttention3D(dim=32, window_size=(2, 4, 4), num_heads=4)
    N = 2 * 4 * 4
    nW = 2
    x = jnp.asarray(rng.standard_normal((2 * nW, N, 32)).astype(np.float32))
    mask = jnp.asarray(
        np.where(rng.random((nW, N, N)) > 0.8, -100.0, 0.0).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x)
    for m in (None, mask):
        out_ref = attn.apply(variables, x, m)
        monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
        out_pl = attn.apply(variables, x, m)
        monkeypatch.delenv("MSPI_PALLAS_INTERPRET")
        np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                                   atol=3e-5)


def test_uniformer_attention_fused_path_matches_jnp(rng, monkeypatch):
    """UniFormer's global Attention through the Pallas path
    (MSPI_PALLAS_INTERPRET=1) == the jnp einsum path."""
    from mspi_tpu.models.uniformer import Attention

    attn = Attention(dim=32, num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 96, 32)).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x)
    out_ref = attn.apply(variables, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out_pl = attn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=3e-5)


def test_syncblock_attention_fused_path_matches_jnp(rng, monkeypatch):
    from mspi_tpu.models.fusion import Attention

    attn = Attention(dim=64, num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 93, 64)).astype(np.float32))
    variables = attn.init(jax.random.PRNGKey(0), x)
    out_ref = attn.apply(variables, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out_pl = attn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=3e-5)


def _ref_self_attention(q, kv, heads):
    B, Nq, C = q.shape
    D = C // heads
    qh = q.reshape(B, Nq, heads, D)
    kh = kv[:, :, :C].reshape(B, -1, heads, D)
    vh = kv[:, :, C:].reshape(B, -1, heads, D)
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", qh * (D ** -0.5), kh), axis=-1)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, vh).reshape(B, Nq, C)


def test_fused_self_attention_matches_reference(rng):
    from mspi_tpu.ops.pallas.pooled_attention import fused_self_attention

    B, N, H, D = 2, 200, 4, 16  # N=200 exercises the q-padding path
    C = H * D
    q = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((B, N, 2 * C)).astype(np.float32))
    out = fused_self_attention(q, kv, num_heads=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_self_attention(q, kv, H)),
                               atol=2e-5)


def test_fused_self_attention_grads_match_reference(rng):
    from mspi_tpu.ops.pallas.pooled_attention import fused_self_attention

    B, N, H, D = 1, 136, 2, 16  # padded Nq -> padded rows carry 0 cotangent
    C = H * D
    q = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    kv = jnp.asarray(rng.standard_normal((B, N, 2 * C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    g_f = jax.grad(lambda q, kv: jnp.sum(
        fused_self_attention(q, kv, num_heads=H, interpret=True) * w),
        argnums=(0, 1))(q, kv)
    g_r = jax.grad(lambda q, kv: jnp.sum(
        _ref_self_attention(q, kv, H) * w), argnums=(0, 1))(q, kv)
    for a, b, name in zip(g_f, g_r, ("dq", "dkv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4,
                                   rtol=1e-3, err_msg=name)


# ---- fused MLP ----

from mspi_tpu.ops.pallas.mlp import fused_mlp


def _ref_mlp(x, w1, b1, w2, b2):
    from mspi_tpu.ops import gelu

    return gelu(x @ w1 + b1) @ w2 + b2


def test_fused_mlp_matches_reference(rng):
    B, N, C, H = 2, 160, 24, 96  # N=160 exercises the row-padding path
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    out = fused_mlp(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_ref_mlp(x, w1, b1, w2, b2)),
                               atol=3e-5)


def test_fused_mlp_grads_match_reference(rng):
    B, N, C, H = 1, 128, 16, 64
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.2)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.2)
    wgt = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    g_f = jax.grad(lambda *a: jnp.sum(fused_mlp(*a, interpret=True) * wgt),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_r = jax.grad(lambda *a: jnp.sum(_ref_mlp(*a) * wgt),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_mlp_modules_fused_path(rng, monkeypatch):
    """Mlp modules route through the fused kernel (MSPI_PALLAS_INTERPRET=1)
    with identical outputs, including the 5-D (VideoSwin) reshape path."""
    from mspi_tpu.models.fusion import Mlp as FusionMlp
    from mspi_tpu.models.videoswin import Mlp as SwinMlp

    m = FusionMlp(dim=32, hidden=128)
    x = jnp.asarray(rng.standard_normal((2, 50, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    np.testing.assert_allclose(np.asarray(m.apply(v, x)), np.asarray(ref),
                               atol=3e-5)

    sm = SwinMlp(dim=16, hidden=64)
    x5 = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 16)).astype(np.float32))
    v5 = sm.init(jax.random.PRNGKey(1), x5)
    monkeypatch.delenv("MSPI_PALLAS_INTERPRET")
    ref5 = sm.apply(v5, x5)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out5 = sm.apply(v5, x5)
    assert out5.shape == x5.shape
    np.testing.assert_allclose(np.asarray(out5), np.asarray(ref5), atol=3e-5)


def test_fused_ln_mlp_matches_reference(rng):
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp

    B, N, C, H = 2, 96, 32, 128
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    def ref(x, g, be, w1, b1, w2, b2):
        from mspi_tpu.ops import gelu

        mu = x.mean(-1, keepdims=True)
        var = (x * x).mean(-1, keepdims=True) - mu * mu
        z = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        return gelu(z @ w1 + b1) @ w2 + b2

    out = fused_ln_mlp(x, g, be, w1, b1, w2, b2, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(x, g, be, w1, b1, w2, b2)),
                               atol=3e-5)

    wgt = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g_f = jax.grad(lambda *a: jnp.sum(fused_ln_mlp(
        *a, eps=1e-6, interpret=True) * wgt), argnums=tuple(range(7)))(
        x, g, be, w1, b1, w2, b2)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) * wgt),
                   argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_fused_ln_mlp_hybrid_matches_reference(rng):
    """Hybrid big-C training path (r4): fused Pallas fwd + XLA-autodiff bwd
    must match the plain math for BOTH the output and all 7 grads."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp_hybrid

    B, N, C, H = 2, 96, 32, 128
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    def ref(x, g, be, w1, b1, w2, b2):
        from mspi_tpu.ops import gelu

        mu = x.mean(-1, keepdims=True)
        var = (x * x).mean(-1, keepdims=True) - mu * mu
        z = (x - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        return gelu(z @ w1 + b1) @ w2 + b2

    out = fused_ln_mlp_hybrid(x, g, be, w1, b1, w2, b2, eps=1e-6,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(x, g, be, w1, b1, w2, b2)),
                               atol=3e-5)

    wgt = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g_f = jax.grad(lambda *a: jnp.sum(fused_ln_mlp_hybrid(
        *a, eps=1e-6, interpret=True) * wgt), argnums=tuple(range(7)))(
        x, g, be, w1, b1, w2, b2)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) * wgt),
                   argnums=tuple(range(7)))(x, g, be, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


def test_big_c_training_routes_hybrid(rng, monkeypatch):
    """A big-C Mlp block (fits_vmem_fwd but not fits_vmem) must take the
    fused path in training when hybrid is on, and the unfused path (None)
    when MSPI_MLP_HYBRID=0 — and grads must flow finitely through it."""
    import flax.linen as nn

    from mspi_tpu.models.fusion import Block
    from mspi_tpu.ops.pallas.mlp import fits_vmem, fits_vmem_fwd

    C, H = 512, 2048  # the SyncBlock shape: the smallest real big-C case
    assert not fits_vmem(C, H) and fits_vmem_fwd(C, H)
    blk = Block(dim=C, num_heads=8)
    x = jnp.asarray(rng.standard_normal((1, 16, C)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    ref_loss, ref_grads = jax.value_and_grad(
        lambda v_: jnp.sum(blk.apply(v_, x, train=True) ** 2))(v)

    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MSPI_MLP_HYBRID", "1")  # opt-in since the r4 null
    loss, grads = jax.value_and_grad(
        lambda v_: jnp.sum(blk.apply(v_, x, train=True) ** 2))(v)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)
    a = jax.tree.leaves(grads)
    b = jax.tree.leaves(ref_grads)
    for ga, gb in zip(a, b):
        assert np.all(np.isfinite(np.asarray(ga)))
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   atol=2e-3, rtol=2e-3)


def test_block_level_ln_mlp_fused_path(rng, monkeypatch):
    """fusion.Block end to end: fused LN+MLP path == plain path."""
    from mspi_tpu.models.fusion import Block

    blk = Block(dim=32, num_heads=4)
    x = jnp.asarray(rng.standard_normal((2, 40, 32)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_tile_is_vmem_budget_aware(monkeypatch):
    # the three MViT stage-transition blocks (Nk=2688 at 224x384) must pick
    # smaller q-tiles so the score intermediates stay under the VMEM budget
    from mspi_tpu.ops.pallas.pooled_attention import _tile

    monkeypatch.delenv("MSPI_ATTN_TILE", raising=False)
    assert _tile(10752, 2688, 8) == 256      # fwd, layers_1 geometry
    assert _tile(10752, 2688, 20) == 128     # bwd
    assert _tile(2688, 2688, 8) == 128       # layers_3 (2688 % 256 != 0)
    assert _tile(1024, 2688, 20) == 128      # layers_14 (padded Nq)
    assert _tile(10752, 672, 8) == 512       # non-transition blocks unchanged
    assert _tile(1024, 672, 20) == 512
    # env override wins uncapped
    monkeypatch.setenv("MSPI_ATTN_TILE", "512")
    assert _tile(10752, 2688, 8) == 512


def test_fused_pooled_attention_shrunk_tile_parity(rng, monkeypatch):
    # drive the budget-shrunk tile path (TQ=128 < Nq) at small shapes by
    # lowering the budget — same code path the Nk=2688 transition blocks take
    monkeypatch.delenv("MSPI_ATTN_TILE", raising=False)
    monkeypatch.setenv("MSPI_ATTN_VMEM_BUDGET", str(128 * 160 * 8))
    B, H, Nq, Nk, D = 1, 1, 256, 160, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))

    from mspi_tpu.ops.pallas.pooled_attention import _tile

    assert _tile(Nq, Nk, 8) == 128 and _tile(Nq, Nk, 20) == 128
    out = fused_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref_attention(q, k, v)),
                               atol=2e-5)
    g_f = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, interpret=True) * w), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda q, k, v: jnp.sum(
        _ref_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_mlp_bwd_tile_matches_fwd_tile(rng):
    """Regression (advisor r2): fwd and bwd must use the SAME row tile.
    N=200, H=2048 used to give fwd TR=200 / bwd TR=128 -> the bwd grid
    truncated and dx rows 128-199 came back uninitialized (NaN on device)
    with ~50% of dw1 dropped."""
    B, N, C, H = 1, 200, 64, 2048
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32) * 0.2)
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((H,), np.float32)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.05)
    b2 = jnp.zeros((C,), np.float32)
    wgt = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    g_f = jax.grad(lambda *a: jnp.sum(fused_mlp(*a, interpret=True) * wgt),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_r = jax.grad(lambda *a: jnp.sum(_ref_mlp(*a) * wgt),
                   argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_f, g_r):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3)


def test_fused_ln_mlp_bwd_tile_matches_fwd_tile(rng):
    """Same regression for the LN+MLP variant (advisor r2, mlp.py:389)."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp

    B, N, C, H = 1, 200, 64, 2048
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.zeros((C,), np.float32)
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.05)
    b1 = jnp.zeros((H,), np.float32)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.05)
    b2 = jnp.zeros((C,), np.float32)
    wgt = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))

    dx = jax.grad(lambda x_: jnp.sum(fused_ln_mlp(
        x_, g, be, w1, b1, w2, b2, eps=1e-6, interpret=True) * wgt))(x)
    assert np.all(np.isfinite(np.asarray(dx)))

    def ref(x_):
        from mspi_tpu.ops import gelu

        mu = x_.mean(-1, keepdims=True)
        var = (x_ * x_).mean(-1, keepdims=True) - mu * mu
        z = (x_ - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        return gelu(z @ w1 + b1) @ w2 + b2

    dx_r = jax.grad(lambda x_: jnp.sum(ref(x_) * wgt))(x)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               atol=5e-3, rtol=1e-3)


def test_fused_attention_bwd_tile_matches_fwd_tile(rng):
    """Regression (advisor r2, pooled_attention.py): Nq=200, Nk=2000 used to
    give fwd TQ=200 / bwd TQ=128 -> truncated bwd grid, dq rows 128+ NaN."""
    B, H, Nq, Nk, D = 1, 1, 200, 2000, 32
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))

    g_f = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, interpret=True) * w), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda q, k, v: jnp.sum(
        _ref_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


# ---------------- int8 inference mode ----------------

def test_fused_ln_mlp_int8_close_to_fp32(rng):
    """Int8 fwd (per-out-channel weight quant + per-row dynamic activation
    quant) stays within quantization-noise distance of the fp32 LN+MLP at a
    transformer shape, including the row-padding path (N=200)."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp_int8

    B, N, C, H = 2, 200, 256, 1024
    x = jnp.asarray(rng.standard_normal((B, N, C)).astype(np.float32))
    g = jnp.asarray(1 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal((H,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)

    def ref(x):
        from mspi_tpu.ops import gelu
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        z = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
        return gelu(z @ w1 + b1) @ w2 + b2

    out = np.asarray(fused_ln_mlp_int8(x, g, be, w1, b1, w2, b2,
                                       interpret=True), np.float32)
    want = np.asarray(ref(x), np.float32)
    assert out.shape == want.shape
    err = np.sqrt(np.mean((out - want) ** 2))
    rms = np.sqrt(np.mean(want ** 2))
    assert err < 0.02 * rms, (err, rms)
    cc = np.corrcoef(out.ravel(), want.ravel())[0, 1]
    assert cc > 0.999, cc


def test_mvit_block_routes_int8_at_inference(rng, monkeypatch):
    """MSPI_QUANT=int8: the MViT block takes the int8 MLP path at inference
    (deterministic=True) and stays close to the fp32 output; with
    train=True the bf16/fp32 fused path is kept bit-for-bit."""
    from mspi_tpu.models.mvit import MultiScaleBlock

    blk = MultiScaleBlock(dim=256, dim_out=256, num_heads=4,
                          input_size=(2, 8, 8), mlp_ratio=4.0, qkv_bias=True,
                          drop_path=0.0, kernel_q=(1, 1, 1),
                          kernel_kv=(1, 1, 1), stride_q=(1, 1, 1),
                          stride_kv=(1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 128, 256)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x, (2, 8, 8))
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    ref, _ = blk.apply(v, x, (2, 8, 8))
    monkeypatch.setenv("MSPI_QUANT", "int8")
    out, _ = blk.apply(v, x, (2, 8, 8))
    train_out, _ = blk.apply(v, x, (2, 8, 8), True,
                             rngs={"dropout": jax.random.PRNGKey(1)})
    refn, outn = np.asarray(ref), np.asarray(out)
    assert not np.allclose(refn, outn)  # int8 path actually taken
    err = np.sqrt(np.mean((outn - refn) ** 2))
    rms = np.sqrt(np.mean(refn ** 2))
    assert err < 0.02 * rms, (err, rms)
    # train path must NOT quantize (drop_path 0 -> deterministic values)
    np.testing.assert_allclose(np.asarray(train_out), refn, atol=1e-6)


def test_convnext_block3d_fused_path(rng, monkeypatch):
    """ConvNextBlock3d routes LN+pwconv1+GELU+pwconv2 through the fused
    kernel (MSPI_PALLAS_INTERPRET=1) with matching outputs and grads."""
    from mspi_tpu.models.fusion import ConvNextBlock3d

    blk = ConvNextBlock3d(dim=24)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8, 24)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    g_ref = jax.grad(lambda v: jnp.sum(blk.apply(v, x) ** 2))(v)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    out = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)
    g = jax.grad(lambda v: jnp.sum(blk.apply(v, x) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_fused_ln_mlp_t_matches_reference(rng):
    """Transposed-layout kernel ([N, C, BT], LN over sublanes) == token-major
    math on the transposed view."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp_t

    N, C, BT, H = 48, 32, 16, 128
    x = jnp.asarray(rng.standard_normal((N, C, BT)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    out = fused_ln_mlp_t(x, g, be, w1, b1, w2, b2, eps=1e-6, interpret=True)

    from mspi_tpu.ops import gelu

    xt = jnp.transpose(x, (0, 2, 1))  # [N, BT, C]
    mu = xt.mean(-1, keepdims=True)
    var = (xt * xt).mean(-1, keepdims=True) - mu * mu
    z = (xt - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    ref = jnp.transpose(gelu(z @ w1 + b1) @ w2 + b2, (0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_ln_mlp_t_res_matches_reference(rng):
    """Residual-folded transposed kernel == shortcut + gamma * mlp(ln(x))."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_mlp_t_res

    N, C, BT, H = 48, 32, 16, 128
    x = jnp.asarray(rng.standard_normal((N, C, BT)).astype(np.float32))
    s = jnp.asarray(rng.standard_normal((N, C, BT)).astype(np.float32))
    gam = jnp.asarray(0.5 * rng.standard_normal(C).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C, H)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((H, C)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.1)

    out = fused_ln_mlp_t_res(x, s, gam, g, be, w1, b1, w2, b2, eps=1e-6,
                             interpret=True)

    from mspi_tpu.ops import gelu

    xt = jnp.transpose(x, (0, 2, 1))  # [N, BT, C]
    mu = xt.mean(-1, keepdims=True)
    var = (xt * xt).mean(-1, keepdims=True) - mu * mu
    z = (xt - mu) * jax.lax.rsqrt(var + 1e-6) * g + be
    y = jnp.transpose(gelu(z @ w1 + b1) @ w2 + b2, (0, 2, 1))
    ref = s + gam[None, :, None] * y
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_fused_ln_t_matches_reference(rng):
    """Transposed standalone LN kernel == LayerNorm over C of [N, C, BT]."""
    from mspi_tpu.ops.pallas.mlp import fused_ln_t

    N, C, BT = 24, 32, 16
    x = jnp.asarray(rng.standard_normal((N, C, BT)).astype(np.float32))
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C).astype(np.float32))
    be = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))

    out = fused_ln_t(x, g, be, eps=1e-6, interpret=True)

    xt = jnp.transpose(x, (0, 2, 1))  # [N, BT, C]
    mu = xt.mean(-1, keepdims=True)
    var = (xt * xt).mean(-1, keepdims=True) - mu * mu
    ref = jnp.transpose((xt - mu) * jax.lax.rsqrt(var + 1e-6) * g + be,
                        (0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_convnext_features_transposed_ln_path(rng, monkeypatch):
    """ConvNeXtTinyFeatures stem/downsample LNs route through the transposed
    LN kernel (MSPI_PRIOR_LN_T) and match the plain path."""
    from mspi_tpu.models.convnext import ConvNeXtTinyFeatures

    model = ConvNeXtTinyFeatures(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32))
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("MSPI_PRIOR_LN_T", "0")
    ref = model.apply(v, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MSPI_PRIOR_LN_T", "1")
    out = model.apply(v, x)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=3e-5)


def test_convnext_block2d_transposed_fused_path(rng, monkeypatch):
    """ConvNeXtBlock2d with MSPI_PRIOR_FUSED_T routes through the transposed
    kernel and matches the plain path."""
    from mspi_tpu.models.convnext import ConvNeXtBlock2d

    blk = ConvNeXtBlock2d(dim=32)
    x = jnp.asarray(rng.standard_normal((8, 6, 8, 32)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    ref = blk.apply(v, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MSPI_PRIOR_FUSED_T", "1")
    out = blk.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_pooled_attention_bwd_extended_vmem_route(rng, monkeypatch):
    """r4: shapes over the 14 MB bwd gate now run the kernel with a raised
    Mosaic vmem_limit (MSPI_ATTN_BWD_VMEM_EXT) instead of the score-
    materialising jnp fallback.  Force the route with a tiny base limit and
    check grads stay correct through it."""
    B, H, Nq, Nk, D = 1, 2, 128, 24, 16
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))

    monkeypatch.setenv("MSPI_ATTN_BWD_VMEM_LIMIT", "1000")  # force need>limit
    g_f = jax.grad(lambda q, k, v: jnp.sum(
        fused_attention(q, k, v, interpret=True) * w), argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(lambda q, k, v: jnp.sum(
        _ref_attention(q, k, v) * w), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_f, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_fused_attention_rel_matches_augmented(rng):
    """r5 in-kernel rel bias == the materialized q_aug/k_aug scheme,
    forward and grads (incl. drel)."""
    from mspi_tpu.ops.pallas.pooled_attention import fused_attention_rel

    B, H, Nq, Nk, D, R = 2, 2, 200, 40, 32, 11
    q = jnp.asarray(rng.standard_normal((B, H, Nq, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, Nk, D)).astype(np.float32))
    rel = jnp.asarray(rng.standard_normal((B, H, Nq, R)).astype(np.float32))
    E = jnp.asarray((rng.random((Nk, R)) < 0.3).astype(np.float32))
    scale = D ** -0.5

    def ref(q, k, v, rel):
        qa = jnp.concatenate([q * scale, rel], -1)
        ka = jnp.concatenate(
            [k, jnp.broadcast_to(E[None, None], (B, H, Nk, R))], -1)
        return fused_attention(qa, ka, v, interpret=True)

    out = fused_attention_rel(q, k, v, rel, E, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(q, k, v, rel)),
                               atol=2e-5)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2, 3))(
        q, k, v, rel)
    g_n = jax.grad(lambda *a: jnp.sum(
        fused_attention_rel(*a, E, scale, interpret=True) ** 2),
        argnums=(0, 1, 2, 3))(q, k, v, rel)
    for a, b in zip(g_r, g_n):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=3e-5)


def test_fused_attention_rel_packed_matches_headmajor(rng):
    """r5 packed token-major kernel (in-kernel head loop + residual) == the
    head-major rel kernel, forward and grads."""
    from mspi_tpu.ops.pallas.pooled_attention import (
        fused_attention_rel, fused_attention_rel_packed)

    B, H, Nq, Nk, D, R = 2, 3, 150, 30, 16, 7
    C = H * D
    qp = jnp.asarray(rng.standard_normal((B, Nq, C)).astype(np.float32))
    kp = jnp.asarray(rng.standard_normal((B, Nk, C)).astype(np.float32))
    vp = jnp.asarray(rng.standard_normal((B, Nk, C)).astype(np.float32))
    relp = jnp.asarray(rng.standard_normal((B, Nq, H * R)).astype(np.float32))
    E = jnp.asarray((rng.random((Nk, R)) < 0.4).astype(np.float32))
    scale = D ** -0.5

    def to_heads(x, d):
        return x.reshape(B, -1, H, d).transpose(0, 2, 1, 3)

    def ref(qp, kp, vp, relp):
        out = fused_attention_rel(to_heads(qp, D), to_heads(kp, D),
                                  to_heads(vp, D), to_heads(relp, R), E,
                                  scale, interpret=True)
        out = out + to_heads(qp, D)  # residual_pooling
        return out.transpose(0, 2, 1, 3).reshape(B, Nq, C)

    out = fused_attention_rel_packed(qp, kp, vp, relp, E, heads=H,
                                     scale=scale, residual=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(ref(qp, kp, vp, relp)), atol=2e-5)
    g_r = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums=(0, 1, 2, 3))(
        qp, kp, vp, relp)
    g_n = jax.grad(lambda *a: jnp.sum(fused_attention_rel_packed(
        *a, E, heads=H, scale=scale, residual=True, interpret=True) ** 2),
        argnums=(0, 1, 2, 3))(qp, kp, vp, relp)
    for a, b in zip(g_r, g_n):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=5e-5)
