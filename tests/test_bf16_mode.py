"""bfloat16 compute mode: outputs stay highly correlated with fp32
(params remain fp32; layer compute casts per flax dtype semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.train.metrics import cc


def test_bf16_fusion_output_close_to_fp32(rng):
    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.ops.layers import set_default_compute_dtype

    cfg = get_config("s3d", overrides={"data": {"resolution": (64, 96)}})
    clips = jnp.asarray(rng.standard_normal((1, 16, 64, 96, 3)).astype(np.float32))
    audio = jnp.asarray(rng.standard_normal((1, 257, 111, 1)).astype(np.float32))

    model = AudioVisualSaliencyModel(cfg=cfg)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips, audio)
    out32, _ = model.apply(variables, clips, audio)

    set_default_compute_dtype(jnp.bfloat16)
    try:
        model16 = AudioVisualSaliencyModel(cfg=cfg)
        out16, _ = model16.apply(variables, clips, audio)
    finally:
        set_default_compute_dtype(None)

    corr = float(cc(jnp.exp(out32), jnp.exp(out16.astype(jnp.float32))))
    assert corr > 0.999, corr
