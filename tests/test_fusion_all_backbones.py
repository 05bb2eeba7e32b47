"""Integration: the full AudioVisualSaliencyModel builds and runs with every
backbone (small resolution), exercising the per-backbone pyramid contracts,
num_vis_tokens computation, lateral strides, and readout temporal collapse.

(morphmlps requires (H/32)(W/32) % 49 == 0 — 224x224-class resolutions —
and is covered by its own parity test; its fusion path shares everything
else tested here.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mspi_tpu.config import get_config
from mspi_tpu.models.fusion import AudioVisualSaliencyModel

RES = (64, 96)


@pytest.mark.parametrize("backbone", ["x3dl", "uniformerb", "videoswins",
                                      "mvitv2s", "slowfast4x16"])
def test_fusion_builds_and_runs(backbone, rng):
    cfg = get_config(backbone, overrides={"data": {"resolution": RES}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    clips = jnp.asarray(rng.standard_normal((1, 16, *RES, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 257, 111, 1)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips, audio)
    out, loss_av = model.apply(variables, clips, audio)
    assert out.shape == (1, *RES)
    assert np.all(np.isfinite(np.array(out)))
    np.testing.assert_allclose(float(jnp.sum(jnp.exp(out))), 1.0, atol=1e-4)
    assert np.isfinite(float(loss_av))
