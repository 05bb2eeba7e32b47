"""Caffe2 blob-name conversion parity vs the reference's regex cascade
(SlowFast/slowfast/utils/c2_model_loading.py), plus an end-to-end synthetic
pickle -> flax load check."""

import pickle

import numpy as np
import pytest

from mspi_tpu.convert.caffe2 import caffe2_blob_to_torch_key, load_caffe2_pickle

from tests.reference_utils import install_reference_stubs

BLOBS = [
    "conv1_w", "res_conv1_bn_s", "res_conv1_bn_b", "res_conv1_bn_rm",
    "res_conv1_bn_riv",
    "t_conv1_w", "t_res_conv1_bn_s", "t_res_conv1_bn_riv",
    "res2_0_branch1_w", "res2_0_branch1_bn_s", "res2_0_branch1_bn_rm",
    "res2_0_branch2a_w", "res2_0_branch2a_bn_s", "res2_0_branch2b_w",
    "res2_1_branch2c_bn_riv", "res5_2_branch2c_w",
    "t_res2_0_branch2a_w", "t_res3_1_branch2b_bn_b", "t_res5_0_branch1_w",
    "t_pool1_subsample_w", "t_pool1_subsample_bn_s", "t_pool1_subsample_bn_rm",
    "t_res2_3_branch2c_bn_subsample_w", "t_res2_3_branch2c_bn_subsample_bn_s",
    "t_res4_5_branch2c_bn_subsample_bn_riv",
]


def reference_convert(blob):
    install_reference_stubs()
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "c2_model_loading",
        "/root/reference/SlowFast/slowfast/utils/c2_model_loading.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.get_name_convert_func()(blob)


@pytest.mark.parametrize("blob", BLOBS)
def test_name_parity(blob):
    ours = caffe2_blob_to_torch_key(blob)
    ref = reference_convert(blob)
    assert ours == ref, (blob, ours, ref)


def test_solver_blobs_dropped():
    assert caffe2_blob_to_torch_key("conv1_w_momentum") is None
    assert caffe2_blob_to_torch_key("lr") is None
    assert caffe2_blob_to_torch_key("model_iter") is None
    assert caffe2_blob_to_torch_key("pred_w") is None


def test_pickle_roundtrip(tmp_path):
    blobs = {"conv1_w": np.zeros((64, 3, 1, 7, 7), np.float32),
             "res_conv1_bn_s": np.ones(64, np.float32),
             "lr": np.zeros(1)}
    path = str(tmp_path / "ckpt.pkl")
    with open(path, "wb") as f:
        pickle.dump({"blobs": blobs}, f)
    sd = load_caffe2_pickle(path)
    assert set(sd) == {"s1.pathway0_stem.conv.weight", "s1.pathway0_stem.bn.weight"}
    assert sd["s1.pathway0_stem.conv.weight"].shape == (64, 3, 1, 7, 7)
