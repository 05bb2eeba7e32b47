"""VideoSwin-S parity vs the actual reference SwinTransformer3D (mmcv deps
stubbed), with shifted windows and relative-position bias exercised at full
window size (224x224 -> no window clamping at any stage)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.config import VideoSwinConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.videoswin import VideoSwinFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


def _stub_mmcv():
    import logging

    mmcv = types.ModuleType("mmcv")
    utils = types.ModuleType("mmcv.utils")
    utils.get_logger = lambda name, log_file=None, log_level=logging.INFO: logging.getLogger(name)
    runner = types.ModuleType("mmcv.runner")
    runner.load_checkpoint = lambda *a, **k: None
    mmcv.utils = utils
    mmcv.runner = runner
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.utils"] = utils
    sys.modules["mmcv.runner"] = runner


@pytest.fixture(scope="module")
def ref_swin():
    install_reference_stubs()
    _stub_mmcv()
    from backbones.video_swin_transformer import SwinTransformer3D

    torch.manual_seed(0)
    model = SwinTransformer3D()  # defaults == VideoSwin-S as built by the factory
    model.eval()
    return model


def test_videoswin_parity_and_shapes(ref_swin, rng):
    H, W = 224, 224
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_swin(torch.tensor(x))

    model = VideoSwinFeatures(cfg=VideoSwinConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_swin.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted,
        strict=False)  # unused final 'norm' in the reference
    feats = model.apply(variables, xj)

    expected_c = (96, 192, 384, 768)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 8, H // stride, W // stride, c), f.shape

    for ours, r in zip(feats, ref_feats):
        np.testing.assert_allclose(to_ncthw(np.array(ours)), r.numpy(),
                                   atol=2e-3, rtol=1e-3)
