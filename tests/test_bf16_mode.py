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
