"""Generic torch-state-dict -> flax-variables converter.

Covers the reference's 5 checkpoint loader variants (SURVEY.md §5):
plain state_dicts (S3D/MorphMLP/UniFormer/ResNet18/ConvNeXt —
s3d.py:420, MorphMLP.py:510, uniformer.py:497, model_utils.py:511-514),
`.pyth` dicts wrapped in 'model_state' (MViT.py:2078, X3D.py:248),
mmaction dicts wrapped in 'state_dict' with a 'backbone.' prefix
(video_swin_transformer.py:593-605), and caffe2 pickles for SlowFast
(SlowFast/slowfast/utils/checkpoint.py:226-294) handled by a name-mapping
pre-pass in mspi_tpu/convert/caffe2.py.

Because every flax module in this framework names its scopes after the torch
module tree (Sequential children become layers_i), the conversion is purely
mechanical:

  torch key part      flax
  'a.3.conv.weight'   params/a/layers_3/conv/kernel   (+ axis transpose)
  'bn.weight'         params/bn/scale (ndim==1)
  'bn.running_mean'   batch_stats/bn/mean
  'fc.weight'         params/fc/kernel  ([O,I] -> [I,O])
  conv weight         [O,I/g,*k] -> [*k, I/g, O]
  anything else       kept verbatim under params (pos embeds, rel_pos, ...)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np


def _set(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _np(tensor) -> np.ndarray:
    if isinstance(tensor, np.ndarray):
        return tensor
    try:
        return tensor.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(tensor)


def convert_state_dict(
    state_dict: Mapping[str, Any],
    rename: Optional[Dict[str, str]] = None,
    transpose_overrides: Optional[Dict[str, Tuple[int, ...]]] = None,
) -> Dict[str, Any]:
    """Convert a torch state_dict to {'params': ..., 'batch_stats': ...}.

    rename: optional exact-prefix renames applied to torch keys first.
    transpose_overrides: torch key -> axes permutation, for leaves whose
      default rule is wrong (rare; e.g. none in the MSPI zoo so far).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if rename:
            for old, new in rename.items():
                if key.startswith(old):
                    key = new + key[len(old):]
                    break
        parts = key.split(".")
        leaf = parts[-1]
        path = [f"layers_{p}" if p.isdigit() else p for p in parts[:-1]]
        if leaf == "num_batches_tracked":
            continue
        arr = _np(tensor)
        if transpose_overrides and key in transpose_overrides:
            _set(params, path + [leaf], arr.transpose(transpose_overrides[key]))
        elif leaf == "running_mean":
            _set(batch_stats, path + ["mean"], arr)
        elif leaf == "running_var":
            _set(batch_stats, path + ["var"], arr)
        elif leaf == "weight":
            if arr.ndim == 1:
                _set(params, path + ["scale"], arr)  # BN / LayerNorm
            elif arr.ndim == 2:
                _set(params, path + ["kernel"], arr.T)  # Linear
            elif arr.ndim == 3:
                _set(params, path + ["kernel"], arr.transpose(2, 1, 0))  # Conv1d
            elif arr.ndim == 4:
                _set(params, path + ["kernel"], arr.transpose(2, 3, 1, 0))  # Conv2d
            elif arr.ndim == 5:
                _set(params, path + ["kernel"], arr.transpose(2, 3, 4, 1, 0))  # Conv3d
            else:
                raise ValueError(f"unhandled weight ndim for {key}: {arr.shape}")
        elif leaf == "bias":
            _set(params, path + ["bias"], arr)
        else:
            _set(params, path + [leaf], arr)
    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def stack_blocks(tree: Dict[str, Any], count: int,
                 inner: str = "scanned") -> Dict[str, Any]:
    """Stack a converted Sequential scope {'layers_0': {...}, ...} into the
    nn.scan layout {'scanned': leaves-with-leading-[count]-axis} (for modules
    like UniFormerFeatures(scan_stage3=True))."""
    import jax

    blocks = [tree[f"layers_{i}"] for i in range(count)]
    stacked = jax.tree.map(lambda *xs: np.stack(xs, axis=0), *blocks)
    return {inner: stacked}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load any of the torch checkpoint containers the reference consumes."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict):
        if "model_state" in blob:  # .pyth (MViT / X3D / SlowFast zoo)
            blob = blob["model_state"]
        elif "state_dict" in blob:  # mmaction (VideoSwin)
            blob = blob["state_dict"]
        elif "model" in blob and isinstance(blob["model"], dict):
            blob = blob["model"]
    return blob


def _tree_paths(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, (dict,)):
            yield from _tree_paths(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def merge_converted(
    target: Dict[str, Any],
    converted: Dict[str, Any],
    strict: bool = True,
    prefix: Tuple[str, ...] = (),
) -> Dict[str, Any]:
    """Overlay converted variables onto an init()-produced variable tree,
    validating shapes.  With strict=False, missing/unexpected keys are
    tolerated (reference load_state_dict(strict=False), inference.py:186).

    `prefix` grafts the converted tree under a sub-scope of the target
    (e.g. loading a bare backbone checkpoint into model/visnet/...).
    """
    import jax

    flat_target = dict(_tree_paths(target))
    flat_conv = {prefix + p[: len(p) - 1] + (p[-1],): v for p, v in _tree_paths(converted)}

    missing = [p for p in flat_target if p not in flat_conv]
    unexpected = [p for p in flat_conv if p not in flat_target]
    if strict and unexpected:
        raise ValueError(f"unexpected keys in checkpoint: {unexpected[:10]}"
                         f" (+{max(0, len(unexpected) - 10)} more)")
    if not strict and (unexpected or missing):
        # surface silent drops (a mis-nested scope once hid zeroed weights)
        print(f"[convert] non-strict merge: {len(unexpected)} checkpoint keys "
              f"unused, {len(missing)} model leaves left at init"
              + (f"; first unused: {'/'.join(unexpected[0])}" if unexpected else ""))

    out = dict(flat_target)
    for p, v in flat_conv.items():
        if p not in flat_target:
            continue
        tgt = flat_target[p]
        if tuple(tgt.shape) != tuple(np.shape(v)):
            raise ValueError(f"shape mismatch at {'/'.join(p)}: "
                             f"ckpt {np.shape(v)} vs model {tuple(tgt.shape)}")
        out[p] = np.asarray(v, dtype=np.asarray(tgt).dtype)

    if strict and missing:
        raise ValueError(f"missing keys in checkpoint: {missing[:10]}"
                         f" (+{max(0, len(missing) - 10)} more)")

    tree: Dict[str, Any] = {}
    for p, v in out.items():
        _set(tree, list(p), v)
    return tree
