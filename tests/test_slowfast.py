"""SlowFast 4x16 R50 parity: torch model composed from the reference's
stem/resnet helpers + an in-test FuseFastToSlow (sf.py:101-159 semantics,
same module names), vs our flax SlowFastFeatures with converted weights."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from mspi_tpu.config import SlowFastConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.slowfast import SlowFastFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


class TorchFuse(nn.Module):
    def __init__(self, dim_in, ratio, kernel, alpha):
        super().__init__()
        self.conv_f2s = nn.Conv3d(dim_in, dim_in * ratio, [kernel, 1, 1],
                                  [alpha, 1, 1], [kernel // 2, 0, 0], bias=False)
        self.bn = nn.BatchNorm3d(dim_in * ratio)
        self.relu = nn.ReLU()

    def forward(self, x):
        fuse = self.relu(self.bn(self.conv_f2s(x[1])))
        return [torch.cat([x[0], fuse], 1), x[1]]


def build_ref_slowfast():
    install_reference_stubs()
    import SlowFast.resnet_helper as resnet_helper
    import SlowFast.stem_helper as stem_helper

    w, beta, alpha, ratio, fk = 64, 8, 4, 2, 5
    odr = beta // ratio
    d = (3, 4, 6, 3)
    tk = [[[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]]]
    inner = w

    model = nn.Module()
    model.s1 = stem_helper.VideoModelStem(
        dim_in=[3, 3], dim_out=[w, w // beta],
        kernel=[tk[0][0] + [7, 7], tk[0][1] + [7, 7]], stride=[[1, 2, 2]] * 2,
        padding=[[tk[0][0][0] // 2, 3, 3], [tk[0][1][0] // 2, 3, 3]])
    model.s1_fuse = TorchFuse(w // beta, ratio, fk, alpha)

    def stage(i, din_s, din_f, dout_s, dout_f, dinner, depth, stride):
        return resnet_helper.ResStage(
            dim_in=[din_s, din_f], dim_out=[dout_s, dout_f],
            dim_inner=[dinner, dinner // beta], temp_kernel_sizes=tk[i],
            stride=[stride] * 2, num_blocks=[depth] * 2, num_groups=[1] * 2,
            num_block_temp_kernel=[depth] * 2, nonlocal_inds=[[], []],
            nonlocal_group=[1, 1], nonlocal_pool=[[1, 2, 2]] * 2, dilation=[1, 1],
            instantiation="dot_product", trans_func_name="bottleneck_transform")

    model.s2 = stage(1, w + w // odr, w // beta, w * 4, w * 4 // beta, inner, d[0], 1)
    model.s2_fuse = TorchFuse(w * 4 // beta, ratio, fk, alpha)
    model.s3 = stage(2, w * 4 + w * 4 // odr, w * 4 // beta, w * 8, w * 8 // beta,
                     inner * 2, d[1], 2)
    model.s3_fuse = TorchFuse(w * 8 // beta, ratio, fk, alpha)
    model.s4 = stage(3, w * 8 + w * 8 // odr, w * 8 // beta, w * 16, w * 16 // beta,
                     inner * 4, d[2], 2)
    model.s4_fuse = TorchFuse(w * 16 // beta, ratio, fk, alpha)
    model.s5 = stage(4, w * 16 + w * 16 // odr, w * 16 // beta, w * 32, w * 32 // beta,
                     inner * 8, d[3], 2)

    def forward(clips):
        slow = torch.stack([clips[:, :, 0], clips[:, :, 4], clips[:, :, 12],
                            clips[:, :, -1]], dim=2)
        x = [slow, clips]
        x = model.s1_fuse(model.s1(x))
        x = model.s2_fuse(model.s2(x))
        feas = [x[0]]
        x = model.s3_fuse(model.s3(x))
        feas.append(x[0])
        x = model.s4_fuse(model.s4(x))
        feas.append(x[0])
        x = model.s5(x)
        feas.append(x[0])
        return feas

    model.forward = forward
    return model


def test_slowfast_parity_and_shapes(rng):
    torch.manual_seed(0)
    ref = build_ref_slowfast()
    ref.eval()

    H, W = 64, 96
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref.forward(torch.tensor(x))

    model = SlowFastFeatures(cfg=SlowFastConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted)
    feats = model.apply(variables, xj)

    expected_c = (320, 640, 1280, 2048)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 4, H // stride, W // stride, c), f.shape

    for ours, r in zip(feats, ref_feats):
        np.testing.assert_allclose(to_ncthw(np.array(ours)), r.numpy(),
                                   atol=1e-3, rtol=1e-3)


def test_slowfast_folded_fast_pathway_matches_plain(rng, monkeypatch):
    """r4 T-folded fast pathway (MSPI_SF_FOLDT=1): banded/block-diagonal
    folded convs + tiled-affine BN must reproduce the plain 5-D pathway
    exactly (zero taps contribute nothing; eval BN is an affine)."""
    import jax.tree_util as jtu

    H, W = 64, 96
    model = SlowFastFeatures(cfg=SlowFastConfig())
    x = jnp.asarray(rng.standard_normal((1, 16, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    # non-trivial running stats so the folded BN affine is really exercised
    def jiggle(path, a):
        leaf = jtu.keystr(path[-1:])
        n = jnp.asarray(rng.standard_normal(a.shape).astype(a.dtype))
        return a + 0.2 * jnp.abs(n) + 0.1 if "var" in leaf else a + 0.2 * n

    variables = dict(variables)
    variables["batch_stats"] = jtu.tree_map_with_path(
        jiggle, variables["batch_stats"])

    monkeypatch.setenv("MSPI_SF_FOLDT", "0")
    ref = model.apply(variables, x)
    monkeypatch.setenv("MSPI_SF_FOLDT", "1")
    out = model.apply(variables, x)
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)


def test_slowfast_folded_stem_uint8_matches_plain(rng, monkeypatch):
    """Phase-2 folded FAST STEM (banded 2-D conv + per-frame ones-channel
    uint8 affine + folded BN/maxpool) == the plain 5-D stem path, for both
    uint8 and float input."""
    H, W = 64, 96
    model = SlowFastFeatures(cfg=SlowFastConfig())
    xf = jnp.asarray(rng.standard_normal((1, 16, H, W, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), xf)
    xu = jnp.asarray(rng.integers(0, 256, (1, 16, H, W, 3)).astype(np.uint8))

    for x in (xf, xu):
        monkeypatch.setenv("MSPI_SF_FOLDT", "0")
        ref = model.apply(variables, x)
        monkeypatch.setenv("MSPI_SF_FOLDT", "1")
        monkeypatch.setenv("MSPI_SF_FOLD_STEM", "1")
        out = model.apply(variables, x)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-4, rtol=3e-4)
