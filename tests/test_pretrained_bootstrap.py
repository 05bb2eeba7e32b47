"""load_pretrained_encoders: converting a released-style torch checkpoint
file into the right sub-scope of the model variables at build time."""

import numpy as np
import pytest
import torch

from mspi_tpu.config import get_config
from mspi_tpu.train.checkpoints import load_pretrained_encoders

from tests.reference_utils import install_reference_stubs


def test_audio_encoder_bootstrap(tmp_path, rng):
    install_reference_stubs()
    from backbones.resnet import get_resnet18

    torch.manual_seed(0)
    ref = get_resnet18(pretrained=False)
    path = str(tmp_path / "resnet18_vggsound.pt")
    torch.save(ref.state_dict(), path)

    import jax
    import jax.numpy as jnp

    from mspi_tpu.models.audio_resnet import AudioResNet18

    # variables tree shaped like the fusion model's audnet scope
    audnet = AudioResNet18()
    av = jax.eval_shape(lambda: audnet.init(jax.random.PRNGKey(0),
                                            jnp.zeros((1, 257, 111, 1))))
    variables = {
        "params": {"audnet": jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                          av["params"])},
        "batch_stats": {"audnet": jax.tree.map(lambda s: np.zeros(s.shape, s.dtype),
                                               av["batch_stats"])},
    }

    cfg = get_config("s3d", overrides={
        "model": {"audio_encoder_weight": path}})
    out = load_pretrained_encoders(cfg, variables)

    got = out["params"]["audnet"]["conv1"]["kernel"]
    want = ref.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(np.asarray(got), want)
    got_bn = out["batch_stats"]["audnet"]["bn1"]["var"]
    np.testing.assert_allclose(np.asarray(got_bn),
                               ref.bn1.running_var.numpy())


def test_missing_weight_files_are_skipped():
    cfg = get_config("s3d", overrides={
        "model": {"audio_encoder_weight": "/nonexistent.pt",
                  "motion_encoder_weight": "/nonexistent2.pt"}})
    variables = {"params": {"audnet": {"x": np.ones(3)}}}
    out = load_pretrained_encoders(cfg, variables)
    np.testing.assert_array_equal(out["params"]["audnet"]["x"], np.ones(3))
