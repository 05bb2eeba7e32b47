"""UniFormer-B backbone parity vs the actual reference implementation
(backbones/uniformer.py) with its YAML config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.config import UniFormerConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.uniformer import UniFormerFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


@pytest.fixture(scope="module")
def ref_uniformer():
    install_reference_stubs()
    from backbones.uniformer import Uniformer

    torch.manual_seed(0)
    model = Uniformer("/root/reference/configs/uniformer_b16x4_k400.yaml")
    model.eval()
    return model


def test_uniformer_parity_and_shapes(ref_uniformer, rng):
    H, W = 64, 96
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_uniformer([torch.tensor(x)])

    model = UniFormerFeatures(cfg=UniFormerConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_uniformer.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted,
        strict=False)  # reference has unused norm/head/pre_logits
    feats = model.apply(variables, xj)

    expected_c = (64, 128, 320, 512)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 8, H // stride, W // stride, c), f.shape

    for ours, r in zip(feats, ref_feats):
        np.testing.assert_allclose(to_ncthw(np.array(ours)), r.numpy(),
                                   atol=1e-3, rtol=1e-3)


def test_split_sablock_parity(rng):
    """SplitSABlock (divided space-time attention, SPLIT=True) vs the actual
    reference block (backbones/uniformer.py:166-201), including the
    residual-restarts-from-x topology and the t_attn zero/ones init."""
    install_reference_stubs()
    from backbones.uniformer import SplitSABlock as RefSplit

    from mspi_tpu.models.uniformer import SplitSABlock

    torch.manual_seed(1)
    dim, heads = 16, 2
    ref = RefSplit(dim=dim, num_heads=heads, qkv_bias=True)
    # reference applies the t_attn fill in Uniformer.__init__; replicate
    with torch.no_grad():
        ref.t_attn.qkv.weight.zero_()
        ref.t_attn.qkv.bias.zero_()
        ref.t_attn.proj.weight.fill_(1.0)
        ref.t_attn.proj.bias.zero_()
    ref.eval()

    x = rng.standard_normal((2, dim, 4, 6, 8)).astype(np.float32)
    with torch.no_grad():
        y_ref = ref(torch.tensor(x)).numpy()

    ours = SplitSABlock(dim=dim, num_heads=heads)
    xj = jnp.asarray(to_nthwc(x))
    shapes = jax.eval_shape(lambda: ours.init(jax.random.PRNGKey(0), xj))
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes),
        convert_state_dict(ref.state_dict()), strict=True)
    y = ours.apply(variables, xj)
    np.testing.assert_allclose(to_ncthw(np.asarray(y)), y_ref,
                               atol=2e-5, rtol=1e-4)
    # init parity: fresh-init t_attn starts as the reference's filled values
    fresh = ours.init(jax.random.PRNGKey(1), xj)
    np.testing.assert_allclose(
        np.asarray(fresh["params"]["t_attn"]["qkv"]["kernel"]), 0.0)
    np.testing.assert_allclose(
        np.asarray(fresh["params"]["t_attn"]["proj"]["kernel"]), 1.0)
