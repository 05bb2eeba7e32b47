"""zero_init_final_bn: zeroes exactly the residual branches' final BN."""

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.config import X3DConfig
from mspi_tpu.models.weight_init import zero_init_final_bn
from mspi_tpu.models.x3d import X3DFeatures


def test_zero_init_final_bn():
    model = X3DFeatures(cfg=X3DConfig())
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0),
                                               jnp.zeros((1, 16, 64, 96, 3))))
    params = jax.tree.map(lambda s: np.ones(s.shape, s.dtype), shapes["params"])
    out = zero_init_final_bn(params)

    block = out["s2"]["pathway0_res0"]["branch2"]
    assert np.all(np.asarray(block["c_bn"]["scale"]) == 0)     # final BN zeroed
    assert np.all(np.asarray(block["a_bn"]["scale"]) == 1)     # others untouched
    assert np.all(np.asarray(block["b_bn"]["scale"]) == 1)     # x3d: b_bn not final
    # shortcut BN untouched
    assert np.all(np.asarray(out["s2"]["pathway0_res0"]["branch1_bn"]["scale"]) == 1)
    # stem untouched
    assert np.all(np.asarray(out["s1"]["pathway0_stem"]["bn"]["scale"]) == 1)
