"""Convergence evidence: a multi-step training run on structured synthetic
data (VERDICT r1 item 10).

The data has a learnable audio-visual structure: each clip contains a bright
moving square whose path the ground-truth saliency map follows, and the
audio spectrogram carries a band whose position encodes the blob row.  A
model that learns anything drives KLD down far below the uniform-prediction
baseline; a broken training path (frozen grads, bf16 overflow, BN
divergence) does not.

Usage:
  python tools/train_synthetic.py [--backbone s3d] [--steps 200] [--batch 4]
      [--res 64,96] [--dtype float32|bfloat16] [--out /tmp/loss_curve.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(rng: np.random.Generator, batch: int, num_frames: int, res,
               spectro_shape):
    h, w = res
    clips = rng.random((batch, num_frames, h, w, 3), dtype=np.float32) * 0.1
    gt = np.zeros((batch, h, w), np.float32)
    audio = rng.standard_normal((batch, *spectro_shape, 1)).astype(np.float32) * 0.05
    for b in range(batch):
        r0 = int(rng.integers(0, h - h // 4))
        c0 = int(rng.integers(0, w - w // 4))
        dr, dc = int(rng.integers(-2, 3)), int(rng.integers(-2, 3))
        for t in range(num_frames):
            r = np.clip(r0 + dr * t, 0, h - h // 4)
            c = np.clip(c0 + dc * t, 0, w - w // 4)
            clips[b, t, r:r + h // 4, c:c + w // 4] += 0.8
        rc, cc = r0 + h // 8, c0 + w // 8
        yy, xx = np.mgrid[0:h, 0:w]
        gt[b] = np.exp(-(((yy - rc) / (h / 8)) ** 2 + ((xx - cc) / (w / 8)) ** 2))
        band = int(spectro_shape[0] * rc / h)
        audio[b, max(0, band - 4):band + 4] += 1.0
    gt += 1e-4
    return {"clips": np.clip(clips, 0, 1), "audio": audio, "gt": gt}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="s3d")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--res", default="64,96")
    p.add_argument("--dtype", default="float32")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--out", default="/tmp/loss_curve.jsonl")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.dtype == "bfloat16":
        from mspi_tpu.ops.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)

    from mspi_tpu.config import get_config
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel
    from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                       make_train_step)

    res = tuple(int(x) for x in args.res.split(","))
    cfg = get_config(args.backbone, overrides={"data": {"resolution": res}})
    model = AudioVisualSaliencyModel(cfg=cfg)
    rng = np.random.default_rng(0)

    first = make_batch(rng, args.batch, cfg.data.num_frames, res,
                       cfg.data.spectro_shape)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(first["clips"][:1]),
        jnp.asarray(first["audio"][:1]))
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    train_step = make_train_step(model, tx, gamma=cfg.train.gamma, donate=True)

    losses = []
    t0 = time.perf_counter()
    with open(args.out, "w") as f:
        for step in range(args.steps):
            batch = first if step == 0 else make_batch(
                rng, args.batch, cfg.data.num_frames, res, cfg.data.spectro_shape)
            state, m = train_step(state, jax.device_put(batch), args.lr)
            if step % 10 == 0 or step == args.steps - 1:
                rec = {"step": step, "loss": float(m["loss"]),
                       "kl": float(m["kl"]), "cc": float(m["cc"])}
                losses.append(rec)
                f.write(json.dumps(rec) + "\n")
                f.flush()
                print(rec)
    dt = time.perf_counter() - t0

    first_loss = losses[0]["loss"]
    last = np.mean([r["loss"] for r in losses[-3:]])
    print(json.dumps({
        "backbone": args.backbone, "dtype": args.dtype, "steps": args.steps,
        "first_loss": round(first_loss, 4), "final_loss": round(float(last), 4),
        "improved": bool(last < first_loss),
        "steps_per_sec": round(args.steps / dt, 3),
    }))


if __name__ == "__main__":
    main()
