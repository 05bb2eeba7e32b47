"""ResNet video classifiers (c2d/i3d/slow) + non-local insertion in ResStage:
parity of the nonlocal-augmented stage vs the actual reference torch code,
and zoo assembly checks (VERDICT r1 item 9; reference
video_model_builder.py:447-663, resnet_helper.py:782-807)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mspi_tpu.convert import convert_state_dict, merge_converted
from mspi_tpu.models.resnet3d import ResStage
from mspi_tpu.models.video_zoo import ResNetVideoClassifier, build_classifier

from tests.reference_utils import install_reference_stubs, to_nthwc, to_ncthw


def test_resstage_with_nonlocal_parity_vs_reference(rng):
    install_reference_stubs()
    import SlowFast.resnet_helper as resnet_helper

    din, dout, inner, nb = 8, 16, 4, 3
    ref = resnet_helper.ResStage(
        dim_in=[din], dim_out=[dout], dim_inner=[inner],
        temp_kernel_sizes=[[3]], stride=[2], num_blocks=[nb],
        num_groups=[1], num_block_temp_kernel=[nb],
        nonlocal_inds=[[1]], nonlocal_group=[1],
        nonlocal_pool=[[1, 2, 2]], dilation=[1],
        instantiation="softmax", trans_func_name="bottleneck_transform")
    ref.eval()

    ours = ResStage(dim_in=[din], dim_out=[dout], dim_inner=[inner],
                    temp_kernel_sizes=[[3]], stride=[2], num_blocks=[nb],
                    num_groups=[1], num_block_temp_kernel=[nb],
                    nonlocal_inds=([1],), nonlocal_group=(1,),
                    nonlocal_pool=((1, 2, 2),),
                    nonlocal_instantiation="softmax")

    x = rng.standard_normal((2, din, 4, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref([torch.from_numpy(x)])[0].numpy()

    variables = ours.init(jax.random.PRNGKey(0), [to_nthwc(x)], train=False)
    converted = convert_state_dict(ref.state_dict(),
                                   jax.tree.map(lambda v: v, variables))
    variables = merge_converted(variables, converted)
    out = ours.apply(variables, [jnp.asarray(to_nthwc(x))], train=False)[0]
    np.testing.assert_allclose(to_ncthw(np.asarray(out)), ref_out,
                               atol=2e-4, rtol=1e-3)


def test_nonlocal_params_created_and_used(rng):
    stage = ResStage(dim_in=[8], dim_out=[8], dim_inner=[4],
                     temp_kernel_sizes=[[1]], stride=[1], num_blocks=[2],
                     num_groups=[1], num_block_temp_kernel=[2],
                     nonlocal_inds=([0],), nonlocal_group=(2,),
                     nonlocal_pool=((1, 2, 2),))
    x = [jnp.asarray(rng.standard_normal((1, 4, 8, 8, 8)).astype(np.float32))]
    v = stage.init(jax.random.PRNGKey(0), x, train=False)
    assert "pathway0_nonlocal0" in v["params"]
    out = stage.apply(v, x, train=False)[0]
    assert out.shape == (1, 4, 8, 8, 8)


def test_resnet_classifiers_assemble(rng):
    clips = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)).astype(np.float32))
    for arch in ("c2d", "i3d", "slow"):
        model = ResNetVideoClassifier(arch=arch, num_classes=7,
                                      width_per_group=8, dropout_rate=0.0)
        v = model.init(jax.random.PRNGKey(0), clips, train=False)
        # torch-mirroring scope names for the converter
        assert "s1" in v["params"] and "s5" in v["params"]
        assert "pathway0_res0" in v["params"]["s2"]
        out = model.apply(v, clips, train=False)
        assert out.shape == (1, 7)
        np.testing.assert_allclose(np.asarray(out).sum(), 1.0, atol=1e-4)

    nln = build_classifier("slow_nln", num_classes=7)
    assert nln.use_nonlocal


def test_resnet_nln_inserts_at_reference_locations(rng):
    model = ResNetVideoClassifier(arch="slow", num_classes=5,
                                  width_per_group=8, use_nonlocal=True,
                                  dropout_rate=0.0)
    clips = jnp.asarray(rng.standard_normal((1, 4, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), clips, train=False)
    # NONLOCAL.LOCATION: res3 blocks [1,3], res4 blocks [1,3,5]
    assert set(k for k in v["params"]["s3"] if "nonlocal" in k) == \
        {"pathway0_nonlocal1", "pathway0_nonlocal3"}
    assert set(k for k in v["params"]["s4"] if "nonlocal" in k) == \
        {"pathway0_nonlocal1", "pathway0_nonlocal3", "pathway0_nonlocal5"}
    out = model.apply(v, clips, train=False)
    assert out.shape == (1, 5)
