"""nn.scan'd UniFormer stage 3 equals the unrolled Sequential, with the
converter's stack_blocks mapping the per-block weights."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.config import UniFormerConfig
from mspi_tpu.convert.torch_convert import stack_blocks
from mspi_tpu.models.uniformer import UniFormerFeatures


def test_scan_stage3_matches_unrolled(rng):
    cfg = UniFormerConfig(depth=(1, 1, 4, 1))  # small depths, same structure
    x = jnp.asarray(rng.standard_normal((1, 16, 64, 96, 3)).astype(np.float32))

    plain = UniFormerFeatures(cfg=cfg, scan_stage3=False)
    variables = jax.jit(plain.init)(jax.random.PRNGKey(0), x)
    feats_plain = plain.apply(variables, x)

    scanned = UniFormerFeatures(cfg=cfg, scan_stage3=True)
    params = dict(variables["params"])
    params["blocks3"] = stack_blocks(params["blocks3"], count=4)
    feats_scan = scanned.apply(
        {"params": params, "batch_stats": variables["batch_stats"]}, x)

    for a, b in zip(feats_plain, feats_scan):
        np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-5,
                                   rtol=1e-5)
