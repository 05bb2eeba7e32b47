"""MorphMLP backbone parity vs the reference torch implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mspi_tpu.config import MorphMLPConfig
from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.morphmlp import MorphMLPFeatures

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


@pytest.fixture(scope="module")
def ref_morph():
    install_reference_stubs()
    from backbones.MorphMLP import MorphMLP_32_features_only

    torch.manual_seed(0)
    model = MorphMLP_32_features_only("/root/reference/configs/K400_MLP_S16x4.yaml")
    model.eval()
    return model


def test_morphmlp_parity_and_shapes(ref_morph, rng):
    # MorphMLP's chunked reshapes need (H/4)(W/4) % 14 == 0, (H/8)(W/8) and
    # (H/16)(W/16) % 28 == 0 and (H/32)(W/32) % 49 == 0 -> 224x224 is the
    # smallest valid size.  (The reference has the same constraint and in
    # fact cannot run morphmlps at the default 224x384 resolution.)
    H, W = 224, 224
    x = rng.standard_normal((1, 3, 16, H, W)).astype(np.float32)
    with torch.no_grad():
        ref_feats = ref_morph(torch.tensor(x))

    model = MorphMLPFeatures(cfg=MorphMLPConfig())
    xj = jnp.array(to_nthwc(x))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), xj))
    converted = convert_state_dict(ref_morph.state_dict())
    variables = merge_converted(
        jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes), converted,
        strict=False)
    feats = model.apply(variables, xj)

    expected_c = (112, 224, 392, 784)
    for f, c, stride in zip(feats, expected_c, (4, 8, 16, 32)):
        assert f.shape == (1, 8, H // stride, W // stride, c), f.shape

    for ours, ref in zip(feats, ref_feats):
        np.testing.assert_allclose(
            to_ncthw(np.array(ours)), ref.numpy(), atol=5e-4, rtol=1e-3)


def test_chunk_mix_folded_matches_plain(rng, monkeypatch):
    """r4 block-diagonal folded chunk mix == the reference
    reshape-transpose-matmul form (exact: zero blocks contribute nothing)."""
    from mspi_tpu.models.morphmlp import MorphFC_S

    m = MorphFC_S(dim=32, segment_dim=4)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    monkeypatch.setenv("MSPI_MORPH_FOLD", "1")
    out = m.apply(v, x)
    monkeypatch.delenv("MSPI_MORPH_FOLD")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # grads flow through the folded construction identically
    g_ref, g_out = [], []
    g_ref = jax.grad(lambda v_: jnp.sum(m.apply(v_, x) ** 2))(v)
    monkeypatch.setenv("MSPI_MORPH_FOLD", "1")
    g_out = jax.grad(lambda v_: jnp.sum(m.apply(v_, x) ** 2))(v)
    for a, b in zip(jax.tree.leaves(g_out), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
