"""Checkpoint save / restore + pretrained-weight bootstrap.

Reference: train.py:181-185 saves bare state_dicts every N epochs;
SlowFast/slowfast/utils/checkpoint.py adds epoch-stamped checkpoints with
optimizer state and auto-resume (:668-740).  Here: orbax for the native
format (params + batch_stats + opt_state + epoch), auto-resume from the
latest checkpoint, and on-the-fly conversion of the released torch
checkpoints (audio/image/motion encoder) at model-build time.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mspi_tpu.config import MSPIConfig
from mspi_tpu.convert import convert_state_dict, load_torch_checkpoint, merge_converted


def save_checkpoint(ckpt_dir: str, state, epoch: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "frozen": state.frozen,
                      "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state,
                      "rng": np.asarray(state.rng),
                      "epoch": np.asarray(epoch)})
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    """Auto-resume pickup (checkpoint.py:668-740 equivalent)."""
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    best_epoch = -1
    for name in os.listdir(ckpt_dir):
        m = re.fullmatch(r"ckpt_(\d+)", name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(ckpt_dir, name)
    return best


def restore_checkpoint(path: str, state):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "frozen": state.frozen,
              "batch_stats": state.batch_stats, "opt_state": state.opt_state,
              "rng": np.asarray(state.rng), "epoch": np.asarray(0)}
    restored = ckptr.restore(os.path.abspath(path), target)
    return state.replace(params=restored["params"], frozen=restored["frozen"],
                         batch_stats=restored["batch_stats"],
                         opt_state=restored["opt_state"],
                         rng=jnp.asarray(restored["rng"])), int(restored["epoch"])


def load_pretrained_encoders(cfg: MSPIConfig, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Convert + graft the released torch encoder checkpoints when present
    (model_utils.py:511-514). Missing files are skipped (random init stays),
    so the framework runs end-to-end without the release artifacts."""
    mc = cfg.model
    jobs = []
    if mc.audio_encoder_weight and os.path.exists(mc.audio_encoder_weight):
        jobs.append((mc.audio_encoder_weight, ("audnet",), {}))
    if mc.image_saliency_encoder_weight and os.path.exists(mc.image_saliency_encoder_weight):
        jobs.append((mc.image_saliency_encoder_weight, ("image_encoder",), {}))
    if mc.motion_encoder_weight and os.path.exists(mc.motion_encoder_weight):
        jobs.append((mc.motion_encoder_weight, ("visnet",),
                     {"motion_encoder": mc.motion_encoder}))
    for path, prefix, extra in jobs:
        if extra.get("motion_encoder") == "slowfast4x16" or path.endswith(".pkl"):
            from mspi_tpu.convert.caffe2 import load_caffe2_pickle

            sd = load_caffe2_pickle(path)
        else:
            sd = load_torch_checkpoint(path)
        if extra.get("motion_encoder") == "videoswins":
            # mmaction checkpoints prefix the trunk with 'backbone.'
            # (video_swin_transformer.py:593-605)
            sd = {k[len("backbone."):] if k.startswith("backbone.") else k: v
                  for k, v in sd.items()}
        converted = convert_state_dict(sd)
        for collection, tree in converted.items():
            sub = variables.get(collection)
            if sub is None:
                continue
            variables = {**variables,
                         collection: merge_converted(sub, _nest(prefix, tree),
                                                     strict=False)}
    return variables


def _nest(prefix, tree):
    for p in reversed(prefix):
        tree = {p: tree}
    return tree
