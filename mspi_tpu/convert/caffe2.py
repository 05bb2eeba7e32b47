"""Caffe2 pickle checkpoint conversion (SLOWFAST_*.pkl releases).

Reference behavior: SlowFast/slowfast/utils/checkpoint.py:226-294 loads
`{"blobs": {name: ndarray}}` pickles and renames caffe2 blob names to the
pytorch module tree via the regex chain in
SlowFast/slowfast/utils/c2_model_loading.py:9-120.

This is an original implementation of the same name grammar, written as a
structured parser instead of a regex cascade.  Caffe2 SlowFast blob names:

  conv1_w                          stem conv (slow)
  conv1_xy_w                       x3d stem spatial conv
  res_conv1_bn_{s,b,rm,riv}        stem BN
  res{S}_{B}_branch1_w             projection shortcut
  res{S}_{B}_branch1_bn_*          projection BN
  res{S}_{B}_branch2{a,b,c}_w      bottleneck convs
  res{S}_{B}_branch2{a,b,c}_bn_*   bottleneck BNs
  t_...                            the same, fast pathway (pathway1)
  t_pool1_subsample[_bn]_*         s1_fuse conv/bn
  t_res{S}_{B}_branch2c_bn_subsample[_bn]_*   s{S}_fuse conv/bn
  pred_{w,b}                       classifier head (dropped for features)
  *_momentum / lr / model_iter     solver state (dropped)

Output is a torch-style state_dict (numpy values) ready for
mspi_tpu.convert.convert_state_dict.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict

import numpy as np

_SUFFIX = {
    "w": "weight",
    "b": "bias",
    "bn_s": "bn:weight",
    "bn_b": "bn:bias",
    "bn_rm": "bn:running_mean",
    "bn_riv": "bn:running_var",
}

_DROP_SUBSTR = ("momentum", "lr", "model_iter")


def _split_suffix(name: str):
    """Return (base, kind) where kind is a _SUFFIX key, longest match first."""
    for suf in ("bn_riv", "bn_rm", "bn_s", "bn_b", "w", "b"):
        if name.endswith("_" + suf):
            return name[: -(len(suf) + 1)], suf
    return None, None


def caffe2_blob_to_torch_key(blob: str):
    """Map one caffe2 blob name to its pytorch state_dict key, or None if the
    blob is solver state / head weights we drop."""
    if any(s in blob for s in _DROP_SUBSTR):
        return None
    if blob.startswith("pred_"):
        return None  # classifier head; the saliency backbones never use it

    pathway = 0
    name = blob
    # fusion blobs (fast->slow lateral convs)
    m = re.fullmatch(r"t_pool1_subsample(_bn)?_(w|b|bn_s|bn_b|bn_rm|bn_riv|s|rm|riv)", blob)
    if m:
        return _fuse_key(1, m.group(1) is not None, m.group(2))
    m = re.fullmatch(r"t_res(\d+)_\d+_branch2c_bn_subsample(_bn)?_(w|b|s|rm|riv)", blob)
    if m:
        return _fuse_key(int(m.group(1)), m.group(2) is not None, m.group(3))

    if name.startswith("t_"):
        pathway = 1
        name = name[2:]

    base, suf = _split_suffix(name)
    if suf is None:
        return None
    leaf = _SUFFIX[suf]

    # stem
    if base == "conv1":
        return f"s1.pathway{pathway}_stem.conv.{leaf}"
    if base == "conv1_xy":
        return f"s1.pathway{pathway}_stem.conv_xy.{leaf}"
    if base == "res_conv1" and leaf.startswith("bn:"):
        return f"s1.pathway{pathway}_stem.bn.{leaf.split(':')[1]}"

    # residual blocks
    m = re.fullmatch(r"res(\d+)_(\d+)_branch(\d+)([a-z]?)", base)
    if m:
        stage, block, branch, conv = m.groups()
        prefix = f"s{stage}.pathway{pathway}_res{block}"
        if branch == "1":
            if leaf.startswith("bn:"):
                return f"{prefix}.branch1_bn.{leaf.split(':')[1]}"
            return f"{prefix}.branch1.{leaf}"
        if leaf.startswith("bn:"):
            return f"{prefix}.branch2.{conv}_bn.{leaf.split(':')[1]}"
        return f"{prefix}.branch2.{conv}.{leaf}"
    return None


def _fuse_key(stage: int, is_bn: bool, suf: str):
    leaf = {"w": "weight", "b": "bias", "s": "weight", "rm": "running_mean",
            "riv": "running_var", "bn_s": "weight", "bn_b": "bias",
            "bn_rm": "running_mean", "bn_riv": "running_var"}[suf]
    mod = "bn" if is_bn else "conv_f2s"
    return f"s{stage}_fuse.{mod}.{leaf}"


def load_caffe2_pickle(path: str) -> Dict[str, np.ndarray]:
    """caffe2 pkl -> torch-style state_dict with numpy values."""
    with open(path, "rb") as f:
        blobs = pickle.load(f, encoding="latin1")["blobs"]
    out = {}
    for blob_name, value in blobs.items():
        key = caffe2_blob_to_torch_key(blob_name)
        if key is not None:
            out[key] = np.asarray(value)
    return out
