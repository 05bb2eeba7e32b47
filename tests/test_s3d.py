"""S3D backbone: pyramid-shape contract + numerical parity against the
reference torch implementation with converted random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.s3d import S3DFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


@pytest.fixture(scope="module")
def ref_s3d():
    install_reference_stubs()
    from backbones.s3d import S3D_features_only

    torch.manual_seed(0)
    model = S3D_features_only()
    model.eval()
    return model


def test_s3d_parity_and_shapes(ref_s3d, rng):
    x = rng.standard_normal((1, 3, 16, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_s3d(torch.tensor(x))

    model = S3DFeatures()
    xj = jnp.array(to_nthwc(x))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_s3d.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), variables), converted
    )
    feats = model.apply(variables, xj)

    assert len(feats) == 4
    expected_c = (192, 480, 832, 1024)
    expected_t = (8, 8, 4, 4)
    for f, c, t, stride in zip(feats, expected_c, expected_t, (4, 8, 16, 32)):
        assert f.shape == (1, t, 64 // stride, 96 // stride, c), f.shape

    for ours, ref in zip(feats, ref_feats):
        np.testing.assert_allclose(
            to_ncthw(np.array(ours)), ref.numpy(), atol=2e-4, rtol=1e-3
        )
