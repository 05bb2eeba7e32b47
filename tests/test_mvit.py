"""MViTv2-S parity vs the actual reference MViT (backbones/MViT.py) with its
YAML config, at the production-style 224x384 resolution (exercising rel-pos
interpolation for the non-square W axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.config import MViTConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.mvit import MViTFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


@pytest.fixture(scope="module")
def ref_mvit():
    install_reference_stubs()
    from backbones.MViT import MViT

    torch.manual_seed(0)
    model = MViT(["/root/reference/configs/MVITv2_S_16x4.yaml"])
    model.eval()
    return model


def test_mvit_parity_and_shapes(ref_mvit, rng):
    H, W = 224, 384
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_mvit([torch.tensor(x)])

    model = MViTFeatures(cfg=MViTConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_mvit.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted,
        strict=False)  # reference keeps an unused trailing 'norm'
    feats = model.apply(variables, xj)

    expected_c = (96, 192, 384, 768)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 8, H // stride, W // stride, c), f.shape

    for ours, r in zip(feats, ref_feats):
        np.testing.assert_allclose(to_ncthw(np.array(ours)), r.numpy(),
                                   atol=2e-3, rtol=1e-3)


def test_headpool_packed_parity():
    """packed=True (H lane-sliced convs on the qkv dense's native [B,N,H*D]
    stream, custom_vjp bwd assembling dx with one lane concat) must match the
    head-major path exactly — fwd, dx, and dkernel — since both apply the
    same shared filter per head (MViT.py:1090-1135)."""
    from mspi_tpu.models.mvit import HeadPool

    B, H, T, Hh, Ww, D = 2, 3, 4, 6, 10, 16
    N = T * Hh * Ww
    xp = jnp.asarray(np.random.RandomState(1).randn(B, N, H * D),
                     jnp.float32)

    def heads(y):
        return y.reshape(B, N, H, D).transpose(0, 2, 1, 3)

    for kernel, stride in [((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 2, 2)),
                           ((3, 3, 3), (2, 8, 8))]:
        m = HeadPool(head_dim=D, kernel=kernel, stride=stride)
        v = m.init(jax.random.PRNGKey(0), xp, (T, Hh, Ww), packed=True)

        def loss(v, xp, packed, m=m):
            y, _ = m.apply(v, xp if packed else heads(xp), (T, Hh, Ww),
                           packed=packed)
            return (y ** 2 + jnp.sin(y)).sum()

        yp, sp = m.apply(v, xp, (T, Hh, Ww), packed=True)
        yh, sh = m.apply(v, heads(xp), (T, Hh, Ww), packed=False)
        assert sp == sh
        np.testing.assert_allclose(np.asarray(yp), np.asarray(yh), atol=1e-5)
        gp = jax.jit(jax.grad(loss, argnums=(0, 1)),
                     static_argnums=2)(v, xp, True)
        gh = jax.grad(loss, argnums=(0, 1))(v, xp, False)
        for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=1e-4)


def test_headpool_temporal_split_parity():
    """The temporal-slice decomposition of the depthwise pool conv
    (MSPI_POOL_TSPLIT, r3 perf: XLA's 5-D depthwise lowering is ~8x off
    its own 2-D fast path at the stage-1 shape) is an exact algebraic
    rewrite: fwd and grads must match the direct 3-D conv."""
    import os

    from mspi_tpu.models.mvit import HeadPool

    B, H, T, Hh, Ww, D = 2, 2, 8, 6, 10, 16
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, T * Hh * Ww, D),
                    jnp.float32)
    prev = os.environ.get("MSPI_POOL_TSPLIT")
    try:
        for kernel, stride in [((3, 3, 3), (1, 1, 1)), ((3, 3, 3), (1, 2, 2)),
                               ((3, 3, 3), (1, 8, 8))]:
            m = HeadPool(head_dim=D, kernel=kernel, stride=stride)
            v = m.init(jax.random.PRNGKey(0), x, (T, Hh, Ww))

            def loss(v, gate, m=m):
                os.environ["MSPI_POOL_TSPLIT"] = gate
                y, _ = m.apply(v, x, (T, Hh, Ww))
                return (y ** 2).sum()

            os.environ["MSPI_POOL_TSPLIT"] = "1"
            y1, s1 = m.apply(v, x, (T, Hh, Ww))
            g1 = jax.grad(lambda v: loss(v, "1"))(v)
            os.environ["MSPI_POOL_TSPLIT"] = "0"
            y0, s0 = m.apply(v, x, (T, Hh, Ww))
            g0 = jax.grad(lambda v: loss(v, "0"))(v)
            assert s1 == s0
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                       atol=1e-5)
            for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-3)
    finally:
        if prev is None:
            os.environ.pop("MSPI_POOL_TSPLIT", None)
        else:
            os.environ["MSPI_POOL_TSPLIT"] = prev
