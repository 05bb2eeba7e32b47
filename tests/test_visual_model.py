"""VisualSaliencyModel (no-audio twin, model_utils.py:576-702) + the
use_sound=False engine path."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.config import get_config
from mspi_tpu.models.fusion import VisualSaliencyModel
from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                   make_train_step)

RES = (64, 96)


def test_visual_model_forward_and_train_step(rng):
    cfg = get_config("s3d", overrides={"data": {"resolution": RES,
                                                "use_sound": False}})
    model = VisualSaliencyModel(cfg=cfg)
    clips = jnp.asarray(rng.standard_normal((2, 16, *RES, 3)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips)

    out, loss_av = model.apply(variables, clips)
    assert out.shape == (2, *RES)
    assert loss_av == 0.0
    np.testing.assert_allclose(np.asarray(jnp.exp(out).sum(axis=(1, 2))), 1.0,
                               atol=1e-4)

    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    # no audnet in the visual model: only image_encoder is frozen
    assert "image_encoder" in state.frozen and "audnet" not in state.frozen
    step = make_train_step(model, tx, gamma=1.0, use_sound=False, donate=False)
    batch = {"clips": clips,
             "gt": jnp.asarray(rng.random((2, *RES)).astype(np.float32) + 1e-3)}
    state, metrics = step(state, batch, 1e-4)
    assert np.isfinite(float(metrics["loss"]))
