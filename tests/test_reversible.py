"""Reversible MViT: block invertibility, O(1)-activation custom-VJP gradient
parity vs plain autodiff, and encoder forward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspi_tpu.config import MViTConfig
from mspi_tpu.models.mvit import MViTFeatures as MViTFeaturesForTest
from mspi_tpu.models.reversible_mvit import (ReversibleBlock,
                                             ReversibleMViTFeatures,
                                             reversible_sequence)

THW = (2, 4, 6)
DIM = 64


def _make_blocks(n, rng_key):
    blocks = [
        ReversibleBlock(dim=DIM, input_size=THW, num_heads=2, mlp_ratio=2.0,
                        qkv_bias=True, kernel_q=(3, 3, 3), kernel_kv=(3, 3, 3),
                        stride_kv=(1, 2, 2))
        for _ in range(n)
    ]
    x = jnp.zeros((1, THW[0] * THW[1] * THW[2], DIM))
    params = [b.init(jax.random.fold_in(rng_key, i), x, x, THW)["params"]
              for i, b in enumerate(blocks)]
    return blocks, params


def test_block_is_invertible(rng):
    blocks, params = _make_blocks(1, jax.random.PRNGKey(0))
    b, p = blocks[0], params[0]
    n = THW[0] * THW[1] * THW[2]
    x1 = jnp.asarray(rng.standard_normal((2, n, DIM)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, n, DIM)).astype(np.float32))
    y1, y2 = b.apply({"params": p}, x1, x2, THW)
    # invert
    x2_rec = y2 - b.apply({"params": p}, y1, method=ReversibleBlock.g_part)
    x1_rec = y1 - b.apply({"params": p}, x2_rec, THW,
                          method=ReversibleBlock.f_part)
    np.testing.assert_allclose(np.array(x2_rec), np.array(x2), atol=1e-4)
    np.testing.assert_allclose(np.array(x1_rec), np.array(x1), atol=1e-4)


def test_reversible_sequence_gradients_match_autodiff(rng):
    blocks, params = _make_blocks(3, jax.random.PRNGKey(1))
    n = THW[0] * THW[1] * THW[2]
    x1 = jnp.asarray(rng.standard_normal((1, n, DIM)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((1, n, DIM)).astype(np.float32))

    def loss_rev(params_list, x1, x2):
        y1, y2 = reversible_sequence(blocks, params_list, x1, x2, THW)
        return jnp.sum(y1 ** 2) + jnp.sum(y2 * 0.5)

    def loss_plain(params_list, x1, x2):
        for b, p in zip(blocks, params_list):
            x1, x2 = b.apply({"params": p}, x1, x2, THW)
        return jnp.sum(x1 ** 2) + jnp.sum(x2 * 0.5)

    v_rev, g_rev = jax.value_and_grad(loss_rev, argnums=(0, 1, 2))(params, x1, x2)
    v_pl, g_pl = jax.value_and_grad(loss_plain, argnums=(0, 1, 2))(params, x1, x2)
    np.testing.assert_allclose(float(v_rev), float(v_pl), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_rev), jax.tree.leaves(g_pl)):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=2e-3,
                                   rtol=1e-2)


def test_reversible_encoder_forward():
    cfg = MViTConfig(depth=4,
                     dim_mul=((1, 2.0),), head_mul=((1, 2.0),),
                     pool_q_stride=((0, 1, 1, 1), (1, 1, 2, 2),
                                    (2, 1, 1, 1), (3, 1, 1, 1)))
    model = ReversibleMViTFeatures(cfg=cfg)
    clips = jnp.zeros((1, 16, 64, 96, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips)
    out = model.apply(variables, clips)
    # depth-4 toy: one transition doubling 96 -> 192; concat fusion -> 384
    assert out.shape == (1, 384)
    assert np.all(np.isfinite(np.array(out)))


def test_remat_blocks_match_plain(rng):
    """remat=True (per-block jax.checkpoint) is numerically identical in
    forward and gradients; only activation memory differs."""
    import jax
    import jax.numpy as jnp

    from mspi_tpu.config import VideoSwinConfig
    from mspi_tpu.models.videoswin import VideoSwinFeatures

    cfg = VideoSwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                          num_heads=(1, 2, 4, 8), window_size=(2, 4, 4))
    x = jnp.asarray(rng.standard_normal((1, 8, 32, 32, 3)).astype(np.float32))
    plain = VideoSwinFeatures(cfg=cfg)
    remat = VideoSwinFeatures(cfg=cfg, remat=True)
    variables = plain.init(jax.random.PRNGKey(0), x)

    def loss(m, v):
        return sum(jnp.sum(f ** 2) for f in m.apply(v, x))

    l1, g1 = jax.value_and_grad(lambda v: loss(plain, v))(variables)
    l2, g2 = jax.value_and_grad(lambda v: loss(remat, v))(variables)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_remat_mvit_features_match_plain(rng):
    """MViTFeatures(remat=True) — the --remat flagship path — matches the
    plain forward exactly and the plain gradients to recompute-rounding
    noise.  Also regression-tests the static thw replay: under nn.remat the
    block's aux thw output comes back traced, and using it for reshapes
    broke tracing (how --remat failed at batch 8)."""
    cfg = MViTConfig()
    x = jnp.asarray(rng.standard_normal((1, 16, 32, 32, 3)).astype(np.float32))
    plain = MViTFeaturesForTest(cfg=cfg)
    remat = MViTFeaturesForTest(cfg=cfg, remat=True)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)

    def loss(m, v):
        return sum(jnp.sum(f ** 2) for f in m.apply(v, x))

    l1, g1 = jax.value_and_grad(lambda v: loss(plain, v))(variables)
    l2, g2 = jax.value_and_grad(lambda v: loss(remat, v))(variables)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-3 * max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, atol=tol)


def test_remat_mvit_block_static_args(rng):
    """nn.remat(MultiScaleBlock, static_argnums=(2,3)) traces AND
    differentiates with the static (thw, train) args passed POSITIONALLY
    (the MViTFeatures remat path; a keyword `train=` at the call site put
    the static index out of range inside jax.checkpoint — forward-only
    tracing didn't catch it, gradients did, which is how --remat failed
    on the flagship)."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from mspi_tpu.models.mvit import MultiScaleBlock

    cls = nn.remat(MultiScaleBlock, static_argnums=(2, 3))
    blk = cls(dim=16, dim_out=16, num_heads=2, input_size=(2, 4, 4),
              mlp_ratio=4.0, qkv_bias=True, drop_path=0.0,
              kernel_q=(1, 1, 1), kernel_kv=(1, 1, 1),
              stride_q=(1, 1, 1), stride_kv=(1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 32, 16)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x, (2, 4, 4), False)
    y, thw = blk.apply(variables, x, (2, 4, 4), False)
    assert y.shape == (1, 32, 16) and thw == (2, 4, 4)

    ref = MultiScaleBlock(dim=16, dim_out=16, num_heads=2, input_size=(2, 4, 4),
                          mlp_ratio=4.0, qkv_bias=True, drop_path=0.0,
                          kernel_q=(1, 1, 1), kernel_kv=(1, 1, 1),
                          stride_q=(1, 1, 1), stride_kv=(1, 1, 1))
    y2, _ = ref.apply(variables, x, (2, 4, 4), False)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-6)

    # gradients must agree too (and must not raise inside jax.checkpoint)
    g1 = jax.grad(lambda v: jnp.sum(blk.apply(v, x, (2, 4, 4), False)[0] ** 2))(
        variables)
    g2 = jax.grad(lambda v: jnp.sum(ref.apply(v, x, (2, 4, 4), False)[0] ** 2))(
        variables)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
