"""Audio ResNet18 (VGGSound) parity vs the reference torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.audio_resnet import AudioResNet18

from tests.reference_utils import install_reference_stubs, to_nchw, to_nhwc


@pytest.fixture(scope="module")
def ref_resnet():
    install_reference_stubs()
    from backbones.resnet import get_resnet18

    torch.manual_seed(0)
    model = get_resnet18(pretrained=False)
    model.eval()
    return model


def test_audio_resnet_parity(ref_resnet, rng):
    x = rng.standard_normal((2, 1, 257, 111)).astype(np.float32)
    with torch.no_grad():
        ref = ref_resnet(torch.tensor(x)).numpy()

    model = AudioResNet18()
    xj = jnp.array(to_nhwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_resnet.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted
    )
    out = model.apply(variables, xj)

    assert out.shape == (2, 9, 4, 512)  # torch [B,512,9,4]
    np.testing.assert_allclose(to_nchw(np.array(out)), ref, atol=2e-4, rtol=1e-3)
