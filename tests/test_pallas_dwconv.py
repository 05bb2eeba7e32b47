"""Pallas fused stride-1 depthwise conv3d: parity vs XLA's depthwise conv
(interpret mode on CPU) and the support gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspi_tpu.ops.pallas.dwconv import (_xla_conv, dwconv3d_supported,
                                        fused_dwconv3d)


@pytest.mark.parametrize("shape,kernel", [
    ((2, 4, 8, 10, 16), (3, 3, 3)),   # the MViT q-pool form
    ((1, 3, 6, 6, 8), (5, 3, 3)),
    ((2, 2, 7, 9, 32), (3, 1, 1)),
])
def test_fused_dwconv3d_matches_xla(rng, shape, kernel):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((*kernel, 1, shape[-1]))
                    .astype(np.float32))
    assert dwconv3d_supported(shape, kernel, (1, 1, 1))
    out = fused_dwconv3d(x, w, interpret=True)
    ref = _xla_conv(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_fused_dwconv3d_grads_match_xla(rng):
    shape, kernel = (2, 3, 6, 8, 16), (3, 3, 3)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((*kernel, 1, shape[-1]))
                    .astype(np.float32))
    g_pl = jax.grad(lambda x, w: (fused_dwconv3d(x, w, interpret=True) ** 2)
                    .sum(), argnums=(0, 1))(x, w)
    g_ref = jax.grad(lambda x, w: (_xla_conv(x, w) ** 2).sum(),
                     argnums=(0, 1))(x, w)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)


def test_dwconv3d_support_gate():
    # strided pools and even kernels stay on XLA
    assert not dwconv3d_supported((8, 8, 56, 96, 96), (3, 3, 3), (1, 2, 2))
    assert not dwconv3d_supported((8, 8, 56, 96, 96), (2, 3, 3), (1, 1, 1))
    # the flagship stage-1 q-pool shape is the largest supported one
    assert dwconv3d_supported((8, 8, 56, 96, 96), (3, 3, 3), (1, 1, 1))
    # a working set past scoped VMEM falls back
    assert not dwconv3d_supported((8, 8, 112, 192, 96), (3, 3, 3), (1, 1, 1))


def test_headpool_fused_path_matches_xla(rng, monkeypatch):
    """HeadPool through the Pallas dwconv (MSPI_PALLAS_INTERPRET=1) == the
    XLA 5-D depthwise conv, fwd and grads — the flagship integration."""
    from mspi_tpu.models.mvit import HeadPool

    B, H, D = 2, 2, 16
    thw = (4, 6, 8)
    pool = HeadPool(D, (3, 3, 3), (1, 1, 1))
    x = jnp.asarray(rng.standard_normal((B, H, np.prod(thw), D))
                    .astype(np.float32))
    v = pool.init(jax.random.PRNGKey(0), x, thw)

    def loss(v, x):
        y, _ = pool.apply(v, x, thw)
        return (y ** 2).sum()

    out_ref, shape_ref = pool.apply(v, x, thw)
    g_ref = jax.grad(loss, argnums=(0, 1))(v, x)
    monkeypatch.setenv("MSPI_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("MSPI_DWCONV", "1")  # opt-in (measured flagship null)
    out_pl, shape_pl = pool.apply(v, x, thw)
    g_pl = jax.grad(loss, argnums=(0, 1))(v, x)
    assert shape_ref == shape_pl
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_ref),
                               atol=1e-4)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-3, rtol=1e-3)
