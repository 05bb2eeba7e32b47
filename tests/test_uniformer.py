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
