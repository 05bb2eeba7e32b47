"""Helpers to import reference torch modules (read-only, for golden outputs
in parity tests only — no reference code is copied into the framework).

The reference imports timm/easydict/fvcore which aren't installed; we stub
the handful of symbols the *backbone* files actually touch.
"""

import sys
import types

import numpy as np
import torch

REFERENCE = "/root/reference"


def _stub_module(name):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def install_reference_stubs():
    # timm.models.layers.{trunc_normal_, DropPath, to_2tuple}
    timm = _stub_module("timm")
    models = _stub_module("timm.models")
    layers = _stub_module("timm.models.layers")
    timm.models = models
    models.layers = layers

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std)
            tensor.clamp_(a * std, b * std)
        return tensor

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple

    # easydict
    easydict = _stub_module("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            if d:
                for k, v in d.items():
                    setattr(self, k, v)

        def __setattr__(self, name, value):
            if isinstance(value, dict) and not isinstance(value, EasyDict):
                value = EasyDict(value)
            super().__setitem__(name, value)

        __getattr__ = dict.__getitem__

    easydict.EasyDict = EasyDict

    # timm.models.vision_transformer (symbols referenced at import time)
    vt = _stub_module("timm.models.vision_transformer")
    vt.VisionTransformer = object
    vt._cfg = lambda **kw: kw
    models.vision_transformer = vt

    # fvcore.nn (FlopCountAnalysis only used in __main__ blocks)
    fvnn = _stub_module("fvcore.nn")
    fvnn.FlopCountAnalysis = object
    fvnn.flop_count_table = lambda *a, **k: ""
    _stub_module("fvcore").nn = fvnn

    # fvcore.common.config.CfgNode: yacs-style config with YAML merge
    import ast

    import yaml

    class CfgNode(dict):
        def __getattr__(self, name):
            try:
                return self[name]
            except KeyError:
                raise AttributeError(name)

        def __setattr__(self, name, value):
            self[name] = value

        def merge_from_file(self, path):
            with open(path) as f:
                overrides = yaml.safe_load(f)
            _cfg_merge(self, overrides or {})

        def clone(self):
            import copy

            return copy.deepcopy(self)

    def _decode(value):
        if isinstance(value, str):
            try:
                return ast.literal_eval(value)
            except (ValueError, SyntaxError):
                return value
        return value

    def _cfg_merge(node, overrides):
        for key, value in overrides.items():
            if isinstance(value, dict) and isinstance(node.get(key), dict):
                _cfg_merge(node[key], value)
            else:
                node[key] = _decode(value)

    fvconfig = _stub_module("fvcore.common.config")
    fvconfig.CfgNode = CfgNode
    common = _stub_module("fvcore.common")
    common.config = fvconfig
    sys.modules["fvcore"].common = common

    # iopath (SlowFast/slowfast/__init__ imports it via utils.env)
    fio = _stub_module("iopath.common.file_io")

    class PathManagerFactory:
        @staticmethod
        def get(key=None):
            import os

            class PM:
                @staticmethod
                def open(path, mode="r"):
                    return open(path, mode)

                @staticmethod
                def exists(path):
                    return os.path.exists(path)

                @staticmethod
                def mkdirs(path):
                    os.makedirs(path, exist_ok=True)

                @staticmethod
                def ls(path):
                    return os.listdir(path)

            return PM()

    fio.PathManagerFactory = PathManagerFactory
    iop_common = _stub_module("iopath.common")
    iop_common.file_io = fio
    _stub_module("iopath").common = iop_common

    # simplejson (slowfast.utils.logging)
    import json as _json

    sys.modules.setdefault("simplejson", _json)

    # pytorchvideo.layers.distributed (slowfast.utils.distributed)
    pvd = _stub_module("pytorchvideo.layers.distributed")
    pvd.cat_all_gather = lambda x, *a, **k: x
    pvd.get_local_process_group = lambda: None
    pvd.get_local_rank = lambda: 0
    pvd.get_local_size = lambda: 1
    pvd.get_world_size = lambda: 1
    pvd.init_distributed_training = lambda *a, **k: None
    pv_layers = _stub_module("pytorchvideo.layers")
    pv_layers.distributed = pvd
    _stub_module("pytorchvideo").layers = pv_layers

    _append_reference_path()


def install_operator_stubs():
    """Extra stubs for importing SlowFast/operators.py (HOGLayerC parity):
    torchvision (unused at class level), pytorchvideo Swish, get_gkern."""
    install_reference_stubs()
    _stub_module("torchvision")
    swish = _stub_module("pytorchvideo.layers.swish")
    swish.Swish = torch.nn.SiLU
    sys.modules["pytorchvideo.layers"].swish = swish

    import math

    def get_gkern(kernlen, std):
        def _gaussian_fn(kernlen, std):
            n = torch.arange(0, kernlen).float()
            n -= n.mean()
            n /= std
            return torch.exp(-0.5 * n ** 2)

        gkern1d = _gaussian_fn(kernlen, std)
        return torch.outer(gkern1d, gkern1d)

    sfu = _stub_module("slowfast.models.utils")
    sfu.get_gkern = get_gkern
    sfm = _stub_module("slowfast.models")
    sfm.utils = sfu
    _stub_module("slowfast").models = sfm
    _append_reference_path()


def _append_reference_path():
    # APPEND so repo-root modules (inference.py, train.py) keep precedence;
    # reference-only packages (backbones, model, SlowFast, config) still
    # resolve to /root/reference.
    if REFERENCE not in sys.path:
        sys.path.append(REFERENCE)


def to_nthwc(x_ncthw: np.ndarray) -> np.ndarray:
    return np.transpose(x_ncthw, (0, 2, 3, 4, 1))


def to_ncthw(x_nthwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nthwc, (0, 4, 1, 2, 3))


def to_nhwc(x_nchw: np.ndarray) -> np.ndarray:
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc: np.ndarray) -> np.ndarray:
    return np.transpose(x_nhwc, (0, 3, 1, 2))
