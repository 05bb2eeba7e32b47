"""Nonlocal block parity vs the reference nonlocal_helper."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.nonlocal_block import Nonlocal

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


def test_nonlocal_parity(rng):
    install_reference_stubs()
    from SlowFast.nonlocal_helper import Nonlocal as RefNonlocal

    for inst in ("softmax", "dot_product"):
        torch.manual_seed(0)
        ref = RefNonlocal(dim=16, dim_inner=8, pool_size=[1, 2, 2],
                          instantiation=inst)
        ref.eval()
        x = rng.standard_normal((2, 16, 4, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x)).numpy()

        model = Nonlocal(dim=16, dim_inner=8, pool_size=(1, 2, 2),
                         instantiation=inst)
        xj = jnp.array(to_nthwc(x))
        shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
        variables = merge_converted(
            jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes),
            convert_state_dict(ref.state_dict()))
        out = model.apply(variables, xj)
        np.testing.assert_allclose(to_ncthw(np.array(out)), ref_out,
                                   atol=1e-5, rtol=1e-4)
