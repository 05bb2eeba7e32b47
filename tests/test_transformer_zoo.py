"""UniFormer / VideoSwin K400 classifiers (zoo breadth, VERDICT r1 §2c:
"missing UniFormer/Swin classifiers").  Assembly + forward smoke at tiny
config scale; the trunks themselves are parity-tested elsewhere
(test_uniformer.py, test_videoswin.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.config import UniFormerConfig, VideoSwinConfig
from mspi_tpu.models.video_zoo import (UniFormerClassifier,
                                       VideoSwinClassifier, build_classifier)


def test_uniformer_classifier_forward():
    cfg = UniFormerConfig(embed_dim=(8, 16, 32, 64), depth=(1, 1, 1, 1),
                          head_dim=8)
    model = UniFormerClassifier(cfg=cfg, num_classes=11)
    clips = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 16, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), clips)
    out = model.apply(variables, clips, train=False)
    assert out.shape == (2, 11)
    np.testing.assert_allclose(np.sum(np.asarray(out), axis=-1), 1.0,
                               rtol=1e-5)  # eval path is softmaxed
    # train path (with BN mutation + dropout rng) runs and differs
    logits, _ = model.apply(variables, clips, train=True,
                            rng=jax.random.PRNGKey(1),
                            mutable=["batch_stats"],
                            rngs={"dropout": jax.random.PRNGKey(2)})
    assert logits.shape == (2, 11)


def test_videoswin_classifier_forward():
    cfg = VideoSwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                          num_heads=(1, 2, 4, 8), window_size=(2, 4, 4))
    model = VideoSwinClassifier(cfg=cfg, num_classes=7)
    clips = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), clips)
    out = model.apply(variables, clips, train=False)
    assert out.shape == (2, 7)
    np.testing.assert_allclose(np.sum(np.asarray(out), axis=-1), 1.0,
                               rtol=1e-5)


def test_build_classifier_names():
    assert isinstance(build_classifier("uniformerb"), UniFormerClassifier)
    assert isinstance(build_classifier("videoswins"), VideoSwinClassifier)


def test_csn_r2plus1d_classifiers(rng):
    """CSN / R(2+1)D family forward shapes + depthwise/factorized params
    (the ptv_model_builder capability, VERDICT r1 §2c zoo row)."""
    clips = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 8, 32, 32, 3)).astype(np.float32))
    for name, t_expect in (("csn", 8), ("r2plus1d", 2)):
        model = build_classifier(name, num_classes=6)
        variables = model.init(jax.random.PRNGKey(0), clips)
        out = model.apply(variables, clips, train=False)
        assert out.shape == (1, 6), name
        np.testing.assert_allclose(np.sum(np.asarray(out), -1), 1.0, rtol=1e-5)
    # csn conv_b is channel-separated: depthwise kernel has 1 input channel
    csn = build_classifier("csn")
    v = csn.init(jax.random.PRNGKey(0), clips)
    kb = v["params"]["s2"]["pathway0_res0"]["branch2"]["b"]["kernel"]
    assert kb.shape[-2] == 1, kb.shape  # groups == dim_inner
