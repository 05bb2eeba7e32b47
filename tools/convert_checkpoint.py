"""Convert a released torch checkpoint to a native orbax checkpoint.

Covers every container variant the reference consumes (SURVEY §5
checkpoint row): plain state_dicts, `.pyth {'model_state': ...}`,
mmaction `{'state_dict': ...}` with `backbone.` prefixes, and caffe2
`.pkl` blobs (SlowFast), reporting drop counts (any nonzero drop on a
backbone conversion is a bug — CLAUDE.md).

Usage:
  # full AVSP fusion model checkpoint
  python tools/convert_checkpoint.py --torch MSPI_mvit.pth \
      --backbone mvitv2s --out ./ckpt_dir

  # a single backbone trunk (e.g. pretrained encoder bootstrap)
  python tools/convert_checkpoint.py --torch swin_small_k400.pth \
      --backbone videoswins --trunk_only --out ./ckpt_dir
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch", required=True, help="torch checkpoint path")
    p.add_argument("--backbone", default="mvitv2s")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--trunk_only", action="store_true",
                   help="convert a bare backbone trunk instead of the full "
                        "AudioVisualSaliencyModel")
    p.add_argument("--caffe2", action="store_true",
                   help="treat input as a caffe2 .pkl blob (SlowFast)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.config import get_config
    from mspi_tpu.convert import (convert_state_dict, load_torch_checkpoint,
                                  merge_converted)

    cfg = get_config(args.backbone)
    if args.trunk_only:
        from mspi_tpu.models.registry import build_backbone

        model = build_backbone(cfg)
        h, w = cfg.data.resolution
        example = (jnp.zeros((1, cfg.data.num_frames, h, w, 3), jnp.float32),)
    else:
        from mspi_tpu.models.fusion import AudioVisualSaliencyModel

        model = AudioVisualSaliencyModel(cfg=cfg)
        h, w = cfg.data.resolution
        example = (jnp.zeros((1, cfg.data.num_frames, h, w, 3), jnp.float32),
                   jnp.zeros((1, *cfg.data.spectro_shape, 1), jnp.float32))

    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *example))
    zeros = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)

    if args.caffe2:
        from mspi_tpu.convert.caffe2 import load_caffe2_pickle

        state_dict = load_caffe2_pickle(args.torch)
    else:
        state_dict = load_torch_checkpoint(args.torch)
    converted = convert_state_dict(state_dict)
    variables = merge_converted(zeros, converted, strict=False)

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(args.out, "converted"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, dict(variables))
    ckptr.wait_until_finished()
    n = sum(1 for _ in jax.tree.leaves(variables))
    print({"out": args.out, "leaves": n, "backbone": args.backbone,
           "trunk_only": bool(args.trunk_only)})


if __name__ == "__main__":
    main()
