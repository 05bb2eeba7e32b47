"""Layer-op parity vs torch: conv3d/conv2d padding+stride+groups, BatchNorm
running-stat convention, max-pool -inf padding, half-pixel linear resize,
exact GELU. These primitives carry every backbone, so parity here gates
everything downstream."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from mspi_tpu.ops import layers as L


def _conv3d_pair(rng, cin, cout, k, groups=1):
    w = rng.standard_normal((cout, cin // groups, *k)).astype(np.float32) * 0.1
    b = rng.standard_normal((cout,)).astype(np.float32) * 0.1
    # torch [O,I/g,kt,kh,kw] -> flax [kt,kh,kw,I/g,O]
    wj = np.transpose(w, (2, 3, 4, 1, 0))
    return w, b, wj


def test_conv3d_parity(rng):
    x = rng.standard_normal((2, 3, 8, 14, 18)).astype(np.float32)  # NCTHW
    w, b, wj = _conv3d_pair(rng, 3, 7, (3, 5, 5))
    ref = F.conv3d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=(2, 2, 2), padding=(1, 2, 2)).numpy()
    mod = L.conv3d(3, 7, (3, 5, 5), stride=2, padding=(1, 2, 2))
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))  # NTHWC
    out = mod.apply({"params": {"kernel": jnp.array(wj), "bias": jnp.array(b)}}, xj)
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_depthwise_conv3d_parity(rng):
    c = 8
    x = rng.standard_normal((2, c, 6, 10, 12)).astype(np.float32)
    w, b, wj = _conv3d_pair(rng, c, c, (7, 1, 1), groups=c)
    ref = F.conv3d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   padding=(3, 0, 0), groups=c).numpy()
    mod = L.conv3d(c, c, (7, 1, 1), padding=(3, 0, 0), groups=c)
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    out = mod.apply({"params": {"kernel": jnp.array(wj), "bias": jnp.array(b)}}, xj)
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_conv2d_parity(rng):
    x = rng.standard_normal((2, 4, 17, 19)).astype(np.float32)
    w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32) * 0.1
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), None, stride=2, padding=1).numpy()
    mod = L.conv2d(4, 6, 3, stride=2, padding=1, bias=False)
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 1))
    wj = np.transpose(w, (2, 3, 1, 0))
    out = mod.apply({"params": {"kernel": jnp.array(wj)}}, xj)
    out = np.transpose(np.array(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_stem_conv3d_s2d_parity(rng):
    """Space-to-depth stem lowering is an exact reindexing of the conv:
    the MViT (3,7,7)/s(2,4,4)/p(1,3,3) patchify geometry vs torch."""
    x = rng.standard_normal((2, 3, 8, 28, 44)).astype(np.float32)  # NCTHW
    w, b, wj = _conv3d_pair(rng, 3, 16, (3, 7, 7))
    ref = F.conv3d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=(2, 4, 4), padding=(1, 3, 3)).numpy()
    mod = L.stem_conv3d(3, 16, (3, 7, 7), stride=(2, 4, 4), padding=(1, 3, 3))
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    out = mod.apply({"params": {"kernel": jnp.array(wj), "bias": jnp.array(b)}}, xj)
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    # the plain-conv twin (MSPI_DISABLE_S2D) must agree exactly
    import os

    os.environ["MSPI_DISABLE_S2D"] = "1"
    try:
        twin = mod.apply({"params": {"kernel": jnp.array(wj), "bias": jnp.array(b)}}, xj)
    finally:
        os.environ.pop("MSPI_DISABLE_S2D")
    np.testing.assert_allclose(np.array(twin), np.transpose(out, (0, 2, 3, 4, 1)),
                               atol=1e-5, rtol=1e-5)


def test_stem_conv2d_s2d_parity(rng):
    """ConvNeXt 4x4/s4 patchify stem through the 2-D s2d path vs torch."""
    x = rng.standard_normal((3, 3, 32, 48)).astype(np.float32)
    w = rng.standard_normal((10, 3, 4, 4)).astype(np.float32) * 0.1
    b = rng.standard_normal((10,)).astype(np.float32) * 0.1
    ref = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                   stride=4).numpy()
    mod = L.stem_conv2d(3, 10, 4, stride=4)
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 1))
    wj = np.transpose(w, (2, 3, 1, 0))
    out = mod.apply({"params": {"kernel": jnp.array(wj), "bias": jnp.array(b)}}, xj)
    out = np.transpose(np.array(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


def test_maxpool3d_parity(rng):
    x = rng.standard_normal((2, 3, 9, 15, 17)).astype(np.float32)
    ref = F.max_pool3d(torch.tensor(x), kernel_size=(3, 3, 3), stride=(2, 2, 2),
                       padding=(1, 1, 1)).numpy()
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    out = L.max_pool(xj, (3, 3, 3), (2, 2, 2), (1, 1, 1))
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_maxpool3d_asymmetric_parity(rng):
    x = rng.standard_normal((1, 2, 8, 14, 14)).astype(np.float32)
    ref = F.max_pool3d(torch.tensor(x), kernel_size=(1, 3, 3), stride=(1, 2, 2),
                       padding=(0, 1, 1)).numpy()
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    out = L.max_pool(xj, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_batchnorm_eval_parity(rng):
    c = 5
    x = rng.standard_normal((2, c, 4, 6, 6)).astype(np.float32)
    bn = torch.nn.BatchNorm3d(c, eps=1e-3, momentum=0.001)
    bn.weight.data = torch.tensor(rng.standard_normal(c).astype(np.float32))
    bn.bias.data = torch.tensor(rng.standard_normal(c).astype(np.float32))
    bn.running_mean = torch.tensor(rng.standard_normal(c).astype(np.float32))
    bn.running_var = torch.tensor(rng.random(c).astype(np.float32) + 0.5)
    bn.eval()
    ref = bn(torch.tensor(x)).detach().numpy()

    mod = L.batchnorm(momentum=0.001, epsilon=1e-3)
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    variables = {
        "params": {"scale": jnp.array(bn.weight.detach().numpy()),
                   "bias": jnp.array(bn.bias.detach().numpy())},
        "batch_stats": {"mean": jnp.array(bn.running_mean.numpy()),
                        "var": jnp.array(bn.running_var.numpy())},
    }
    out = mod.apply(variables, xj, use_running_average=True)
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_batchnorm_train_updates_running_stats(rng):
    c = 4
    x = rng.standard_normal((8, c, 2, 4, 4)).astype(np.float32)
    bn = torch.nn.BatchNorm3d(c, eps=1e-5, momentum=0.1)
    bn.train()
    ref = bn(torch.tensor(x)).detach().numpy()

    mod = L.batchnorm(momentum=0.1, epsilon=1e-5)
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    variables = {
        "params": {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
    }
    out, updated = mod.apply(variables, xj, use_running_average=False,
                             mutable=["batch_stats"])
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.array(updated["batch_stats"]["mean"]),
                               bn.running_mean.numpy(), atol=1e-5)
    # torch running_var uses the unbiased batch variance
    np.testing.assert_allclose(np.array(updated["batch_stats"]["var"]),
                               bn.running_var.numpy(), atol=1e-4, rtol=1e-3)


def test_trilinear_upsample_parity(rng):
    x = rng.standard_normal((2, 3, 4, 7, 12)).astype(np.float32)
    for sf in [(1, 2, 2), (1, 4, 4), (1, 8, 8), (2, 1, 1)]:
        ref = F.interpolate(torch.tensor(x), scale_factor=sf, mode="trilinear",
                            align_corners=False).numpy()
        xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
        out = L.Upsample(scale=sf)(xj)
        out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
        np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_bilinear_upsample_parity(rng):
    x = rng.standard_normal((2, 3, 7, 12)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x), scale_factor=2, mode="bilinear",
                        align_corners=False).numpy()
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 1))
    out = L.Upsample(scale=(2, 2))(xj)
    out = np.transpose(np.array(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_upsample_stencil_matches_dense_resize(rng, monkeypatch):
    # The integer-factor stencil path (MSPI_STENCIL_RESIZE=1; measured
    # slower on the flagship TPU program, kept gated for re-measurement)
    # must agree with jax.image.resize's dense dot_general formulation
    # (which the torch-parity tests above pin) on odd sizes and mixed
    # factors, including the gradient.
    monkeypatch.setenv("MSPI_STENCIL_RESIZE", "1")
    x = rng.standard_normal((2, 3, 5, 9, 4)).astype(np.float32)
    xj = jnp.array(x)
    for sf, axes in [((1, 2, 2), (1, 2, 3)), ((2, 4, 4), (1, 2, 3)),
                     ((8, 8), (2, 3)), ((3, 3), (2, 3))]:
        shape = list(x.shape)
        for s, ax in zip(sf, axes):
            shape[ax] = shape[ax] * s
        want = jax.image.resize(xj, tuple(shape), method="linear",
                                antialias=False)
        got = L.resize_linear(xj, sf, axes)
        np.testing.assert_allclose(np.array(got), np.array(want),
                                   atol=2e-6, rtol=1e-6)
    # gradient of the stencil path (training uses it in the decoder)
    g = jax.grad(lambda y: jnp.sum(L.resize_linear(y, (2, 2), (2, 3)) ** 2))(xj)
    gref = jax.grad(lambda y: jnp.sum(jax.image.resize(
        y, (2, 3, 10, 18, 4), method="linear", antialias=False) ** 2))(xj)
    np.testing.assert_allclose(np.array(g), np.array(gref), atol=1e-5)


def test_gelu_exact(rng):
    x = rng.standard_normal(64).astype(np.float32) * 3
    ref = F.gelu(torch.tensor(x)).numpy()  # torch default = exact erf
    out = np.array(L.gelu(jnp.array(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_layernorm_eps(rng):
    x = rng.standard_normal((2, 5, 16)).astype(np.float32)
    ln = torch.nn.LayerNorm(16)
    ln.weight.data = torch.tensor(rng.standard_normal(16).astype(np.float32))
    ln.bias.data = torch.tensor(rng.standard_normal(16).astype(np.float32))
    ref = ln(torch.tensor(x)).detach().numpy()
    mod = L.layernorm()
    out = mod.apply({"params": {"scale": jnp.array(ln.weight.detach().numpy()),
                                "bias": jnp.array(ln.bias.detach().numpy())}},
                    jnp.array(x))
    np.testing.assert_allclose(np.array(out), ref, atol=1e-5, rtol=1e-5)


def test_avg_pool_parity(rng):
    x = rng.standard_normal((2, 3, 8, 10, 10)).astype(np.float32)
    ref = F.avg_pool3d(torch.tensor(x), kernel_size=(2, 2, 2), stride=(2, 2, 2)).numpy()
    xj = jnp.transpose(jnp.array(x), (0, 2, 3, 4, 1))
    out = L.avg_pool(xj, (2, 2, 2), (2, 2, 2))
    out = np.transpose(np.array(out), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


def test_temporal_dwconv_stencil_parity():
    """TemporalDWConv (shifted-slice stencil, r3 perf) must match the
    direct depthwise (kt,1,1) conv exactly, fwd and grads, and expose the
    identical param tree."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mspi_tpu.ops import TemporalDWConv, conv3d

    B, T, H, W, C = 2, 4, 6, 8, 16
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, H, W, C),
                    jnp.float32)
    m = TemporalDWConv(C, 7)
    v = m.init(jax.random.PRNGKey(0), x)
    prev = os.environ.get("MSPI_TDW_STENCIL")
    try:
        os.environ["MSPI_TDW_STENCIL"] = "1"
        y1 = m.apply(v, x)
        g1 = jax.grad(lambda v: (m.apply(v, x) ** 2).sum())(v)
        os.environ["MSPI_TDW_STENCIL"] = "0"
        y0 = m.apply(v, x)
        g0 = jax.grad(lambda v: (m.apply(v, x) ** 2).sum())(v)
    finally:
        if prev is None:
            os.environ.pop("MSPI_TDW_STENCIL", None)
        else:
            os.environ["MSPI_TDW_STENCIL"] = prev
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
    ref = conv3d(C, C, (7, 1, 1), padding=(3, 0, 0), groups=C)
    vr = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.map(lambda a: a.shape, v)
            == jax.tree.map(lambda a: a.shape, vr))


def test_stem_uint8_fold_matches_normalized(rng):
    """Raw-uint8 clips through the stems == normalize_frames then stems:
    the ImageNet affine is folded into the conv weights (exact linear
    algebra, fp32 fold)."""
    import jax
    import jax.numpy as jnp

    from mspi_tpu.data.video import normalize_frames
    from mspi_tpu.ops.layers import stem_conv2d, stem_conv3d

    u8 = rng.integers(0, 256, (2, 6, 32, 40, 3), dtype=np.uint8)
    norm = jnp.asarray(normalize_frames(u8))

    stem = stem_conv3d(3, 16, (3, 7, 7), (2, 4, 4), (1, 3, 3))
    v = stem.init(jax.random.PRNGKey(0), norm)
    want = stem.apply(v, norm)
    got = stem.apply(v, jnp.asarray(u8))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    stem2 = stem_conv2d(3, 16, 4, 4, 0)
    v2 = stem2.init(jax.random.PRNGKey(1), norm[:, 0])
    want2 = stem2.apply(v2, norm[:, 0])
    got2 = stem2.apply(v2, jnp.asarray(u8[:, 0]))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=2e-4, rtol=1e-4)

    # bias-free stem synthesizes the offset bias
    stem3 = stem_conv3d(3, 8, (1, 2, 2), (1, 2, 2), 0, bias=False)
    v3 = stem3.init(jax.random.PRNGKey(2), norm)
    np.testing.assert_allclose(np.asarray(stem3.apply(v3, jnp.asarray(u8))),
                               np.asarray(stem3.apply(v3, norm)),
                               atol=2e-4, rtol=1e-4)


def test_tapgrad_conv3d_matches_nn_conv(rng):
    """TapGradConv3d (r4): fwd identical to nn.Conv, grads (dx, dW, db)
    match plain-conv autodiff — dense, strided, and depthwise forms."""
    import jax
    from mspi_tpu.ops.layers import conv3d, conv3d_tapgrad

    cases = [
        dict(cin=12, cout=16, k=(3, 3, 3), s=1, p=1, g=1),
        dict(cin=12, cout=8, k=(4, 1, 1), s=(4, 1, 1), p=0, g=1),
        dict(cin=12, cout=12, k=(1, 7, 7), s=1, p=(0, 3, 3), g=12),
    ]
    x = jnp.asarray(rng.standard_normal((2, 4, 10, 12, 12)).astype(np.float32))
    for c in cases:
        ref_m = conv3d(c["cin"], c["cout"], c["k"], c["s"], c["p"], groups=c["g"])
        tap_m = conv3d_tapgrad(c["cin"], c["cout"], c["k"], c["s"], c["p"],
                               groups=c["g"])
        v = ref_m.init(jax.random.PRNGKey(0), x)
        # param trees must be identical (converter parity)
        assert jax.tree.structure(v) == jax.tree.structure(
            tap_m.init(jax.random.PRNGKey(0), x))

        y_ref = ref_m.apply(v, x)
        y_tap = tap_m.apply(v, x)
        np.testing.assert_allclose(np.asarray(y_tap), np.asarray(y_ref),
                                   atol=1e-5, rtol=1e-5)

        w = jnp.asarray(rng.standard_normal(y_ref.shape).astype(np.float32))
        g_ref = jax.grad(lambda v_, x_: jnp.sum(ref_m.apply(v_, x_) * w),
                         argnums=(0, 1))(v, x)
        g_tap = jax.grad(lambda v_, x_: jnp.sum(tap_m.apply(v_, x_) * w),
                         argnums=(0, 1))(v, x)
        for a, b in zip(jax.tree.leaves(g_tap), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4)
