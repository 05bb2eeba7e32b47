"""bfloat16 compute mode: backbone features stay highly correlated with
fp32 (params remain fp32; layer compute casts per flax dtype semantics), and
the full fusion model stays finite and normalised.

(The final saliency map of a *random-init* model is nearly flat, so its CC
between precisions is noise-dominated — feature-level correlation is the
meaningful check without released weights.)"""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.ops.layers import set_default_compute_dtype


def _corr(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    a -= a.mean()
    b -= b.mean()
    return float((a @ b) / np.sqrt((a @ a) * (b @ b)))


def test_bf16_backbone_features_close_to_fp32(rng):
    from mspi_tpu.models.s3d import S3DFeatures

    x = jnp.asarray(rng.standard_normal((1, 16, 64, 96, 3)).astype(np.float32))
    model = S3DFeatures()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    feats32 = model.apply(variables, x)

    set_default_compute_dtype(jnp.bfloat16)
    try:
        feats16 = S3DFeatures().apply(variables, x)
    finally:
        set_default_compute_dtype(None)

    for f32, f16 in zip(feats32, feats16):
        assert f16.dtype == jnp.bfloat16
        c = _corr(f32, f16.astype(jnp.float32))
        assert c > 0.99, c


def test_bf16_fusion_finite_and_normalised(rng):
    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel

    cfg = get_config("s3d", overrides={"data": {"resolution": (64, 96)}})
    clips = jnp.asarray(rng.standard_normal((1, 16, 64, 96, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 257, 111, 1)).astype(np.float32))
    model = AudioVisualSaliencyModel(cfg=cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips, audio)

    set_default_compute_dtype(jnp.bfloat16)
    try:
        out16, loss16 = AudioVisualSaliencyModel(cfg=cfg).apply(variables, clips, audio)
    finally:
        set_default_compute_dtype(None)
    out16 = np.asarray(out16, np.float32)
    assert np.all(np.isfinite(out16))
    np.testing.assert_allclose(np.exp(out16).sum(), 1.0, atol=2e-2)
    assert np.isfinite(float(loss16))


def test_bf16_training_step_parity_with_fp32(rng):
    """Three bf16-compute train steps track the fp32 losses closely on a
    tiny fusion model (VERDICT r1 item 10: bf16-training validation).
    Params/optimizer state stay fp32 in both modes; only layer compute
    dtype differs."""
    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                       make_train_step)

    res = (64, 96)
    cfg = get_config("s3d", overrides={"data": {"resolution": res}})
    batch = {
        "clips": jnp.asarray(rng.random((2, cfg.data.num_frames, *res, 3),
                                        ).astype(np.float32)),
        "audio": jnp.asarray(rng.standard_normal(
            (2, *cfg.data.spectro_shape, 1)).astype(np.float32)),
        "gt": jnp.asarray(rng.random((2, *res)).astype(np.float32) + 1e-3),
    }

    def run(mode):
        set_default_compute_dtype(mode)
        try:
            model = AudioVisualSaliencyModel(cfg=cfg)
            variables = model.init(jax.random.PRNGKey(0),
                                   batch["clips"][:1], batch["audio"][:1])
            tx = make_optimizer(cfg)
            state = create_train_state(cfg, variables, tx)
            step = make_train_step(model, tx, gamma=cfg.train.gamma,
                                   donate=False)
            losses = []
            for _ in range(3):
                state, m = step(state, batch, 1e-4)
                losses.append(float(m["loss"]))
            return losses
        finally:
            set_default_compute_dtype(jnp.float32)

    fp32 = run(jnp.float32)
    bf16 = run(jnp.bfloat16)
    assert all(np.isfinite(bf16)), bf16
    for a, b in zip(fp32, bf16):
        assert abs(a - b) < 0.05 * max(abs(a), 1.0), (fp32, bf16)
