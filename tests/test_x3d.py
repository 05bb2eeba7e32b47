"""X3D-L backbone parity: compose the torch model from the *reference's own*
stem/resnet helpers (SlowFast/stem_helper.py, SlowFast/resnet_helper.py) with
the X3D_L.yaml parameters, then compare against our flax X3DFeatures with
converted weights."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from mspi_tpu.config import X3DConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.x3d import X3DFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


def build_ref_x3d():
    """X3D._construct_network (backbones/X3D.py:166-234) with X3D_L.yaml:
    w_mul 2.0, d_mul 5.0, bottleneck 2.25, dim_c1 12, SCALE_RES2 False,
    channelwise 3x3x3, x3d_transform."""
    install_reference_stubs()
    import SlowFast.resnet_helper as resnet_helper
    import SlowFast.stem_helper as stem_helper

    from mspi_tpu.models.resnet3d import round_width

    w_mul, d_mul, bottleneck = 2.0, 5.0, 2.25
    dim_c1 = 12
    dim_res2 = dim_c1
    dims = [dim_res2]
    for _ in range(3):
        dims.append(round_width(dims[-1], 2.0, divisor=8))
    block_basis = [(1, dims[0], 2), (2, dims[1], 2), (5, dims[2], 2), (3, dims[3], 2)]

    model = nn.Module()
    dim_res1 = round_width(dim_c1, w_mul)
    model.s1 = stem_helper.VideoModelStem(
        dim_in=[3], dim_out=[dim_res1], kernel=[[5, 3, 3]], stride=[[1, 2, 2]],
        padding=[[2, 1, 1]], stem_func_name="x3d_stem")
    dim_in = dim_res1
    for stage, (blocks, dim, stride) in enumerate(block_basis):
        dim_out = round_width(dim, w_mul)
        dim_inner = int(bottleneck * dim_out)
        n_rep = int(math.ceil(d_mul * blocks))
        s = resnet_helper.ResStage(
            dim_in=[dim_in], dim_out=[dim_out], dim_inner=[dim_inner],
            temp_kernel_sizes=[[3]], stride=[stride], num_blocks=[n_rep],
            num_groups=[dim_inner], num_block_temp_kernel=[n_rep],
            nonlocal_inds=[[]], nonlocal_group=[1], nonlocal_pool=[[1, 2, 2]],
            dilation=[1], instantiation="dot_product",
            trans_func_name="x3d_transform", stride_1x1=False,
            drop_connect_rate=0.0)
        setattr(model, f"s{stage + 2}", s)
        dim_in = dim_out

    def forward(x):
        xs = model.s1([x])
        feas = []
        for name in ("s2", "s3", "s4", "s5"):
            xs = getattr(model, name)(xs)
            feas.append(xs[0])
        return feas

    model.forward = forward
    return model


def test_x3d_parity_and_shapes(rng):
    torch.manual_seed(0)
    ref = build_ref_x3d()
    ref.eval()

    H, W = 64, 96
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref.forward(torch.tensor(x))

    model = X3DFeatures(cfg=X3DConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted)
    feats = model.apply(variables, xj)

    expected_c = (24, 48, 96, 192)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 16, H // stride, W // stride, c), f.shape

    for ours, r in zip(feats, ref_feats):
        np.testing.assert_allclose(to_ncthw(np.array(ours)), r.numpy(),
                                   atol=5e-4, rtol=1e-3)
