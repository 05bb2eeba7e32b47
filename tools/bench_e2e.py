"""End-to-end training benchmark: real JPEG decode -> host pipeline ->
device train step, vs. the same step on synthetic in-HBM data.

VERDICT r1 item 8: all prior bench numbers fed synthetic device arrays; this
tool measures the whole path — frame/JPEG decode + resize + audio windows on
host threads (mspi_tpu.data.loader.DataLoader, optionally the native
libjpeg loader), overlapped with the jitted AVSP train step via JAX async
dispatch — and reports both steps/s so the overlap efficiency is visible.

Usage:
  python tools/bench_e2e.py [--backbone s3d] [--batch 2] [--steps 12]
      [--workers 4] [--res 224,384] [--frame_size 360,640] [--native]

With no --data_root it synthesises a JPEG AVSP tree (frames stored at
--frame_size, the decode cost of a real video dump) under /tmp and reuses
it across runs.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synth_tree(root: str, n_frames: int, size, n_videos: int = 6) -> str:
    # train-mode dataset length == number of videos (one random window per
    # video per epoch), so n_videos must cover the batch with drop_last
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return root
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests"))
    from synthetic_data import build_avsp_tree

    build_avsp_tree(root,
                    datasets=tuple(("AVAD", f"v{i}") for i in range(n_videos)),
                    n_frames=n_frames, size=size)
    open(marker, "w").close()
    return root


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default=os.environ.get("MSPI_BENCH_BACKBONE", "s3d"))
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--res", default="224,384")
    p.add_argument("--frame_size", default="360,640",
                   help="stored JPEG resolution (decode cost)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--native", action="store_true",
                   help="use the libjpeg native loader for frame decode")
    args = p.parse_args()

    if args.native:
        os.environ["MSPI_NATIVE_LOADER"] = "1"
    res = tuple(int(x) for x in args.res.split(","))
    fsize = tuple(int(x) for x in args.frame_size.split(","))

    import jax
    import jax.numpy as jnp

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mspi_tpu.config import get_config
    from mspi_tpu.data.datasets import AudioVisualDataset
    from mspi_tpu.data.loader import DataLoader
    from mspi_tpu.train.engine import (create_train_state, make_optimizer,
                                       make_train_step)

    n_videos = max(6, 2 * args.batch)
    n_frames = max(64, 16 + 8 * args.steps)
    root = args.data_root or synth_tree(
        f"/tmp/mspi_e2e_{fsize[0]}x{fsize[1]}_{n_videos}v{n_frames}f",
        n_frames=n_frames, size=fsize, n_videos=n_videos)

    cfg = get_config(args.backbone, overrides={"data": {"resolution": res}})
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel

    model = AudioVisualSaliencyModel(cfg=cfg)
    ds = AudioVisualDataset(root, "AVAD", 1, cfg.data.num_frames, "train",
                            True, res)
    loader = DataLoader(ds, args.batch, shuffle=True, drop_last=True,
                        num_workers=args.workers)

    def batches(n):
        while True:
            for b in loader:
                yield b
                n -= 1
                if n <= 0:
                    return

    first = next(iter(loader))
    clips = jnp.asarray(first["clips"][:1], jnp.float32)
    audio = jnp.asarray(first["audio"][:1], jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), clips, audio)
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    train_step = make_train_step(model, tx, gamma=cfg.train.gamma, donate=True)

    def put(b):
        return {"clips": jnp.asarray(b["clips"], jnp.float32),
                "audio": jnp.asarray(b["audio"], jnp.float32),
                "gt": jnp.asarray(b["gt"], jnp.float32)}

    # warmup / compile
    state, m = train_step(state, put(first), cfg.solver.lr)
    jax.block_until_ready(m)

    # --- end-to-end: decode on host threads, double-buffered device
    # prefetch, async-dispatch steps ---
    from mspi_tpu.data.loader import prefetch_to_device

    t0 = time.perf_counter()
    n = 0
    for b in prefetch_to_device(map(put, batches(args.steps)), size=2):
        state, m = train_step(state, b, cfg.solver.lr)
        n += 1
    jax.block_until_ready(m)
    dt_e2e = time.perf_counter() - t0

    # --- compute-only: same batch resident in HBM, steps chained inside
    # ONE program (the only timing robust to the tunnel's async readiness
    # ACKs — see ROUND1_NOTES.md; a dispatch loop over-reports) ---
    body_fn = make_train_step(model, tx, gamma=cfg.train.gamma, donate=False,
                              jit=False)
    dev_batch = jax.device_put(put(first))

    @jax.jit
    def run_n(state, batch, n):
        def body(_, st):
            new_st, _metrics = body_fn(st, batch, cfg.solver.lr)
            return new_st

        return jax.lax.fori_loop(0, n, body, state)

    s1 = run_n(state, dev_batch, 1)
    float(jnp.sum(jax.tree.leaves(s1.params)[0]))  # compile + force D2H
    t0 = time.perf_counter()
    s2 = run_n(state, dev_batch, args.steps + 1)
    float(jnp.sum(jax.tree.leaves(s2.params)[0]))
    dt_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    s3 = run_n(state, dev_batch, 1)
    float(jnp.sum(jax.tree.leaves(s3.params)[0]))
    dt_compute = dt_n - (time.perf_counter() - t0)

    out = {
        "backbone": args.backbone,
        "batch": args.batch,
        "steps": args.steps,
        "e2e_steps_per_sec": round(n / dt_e2e, 3),
        "compute_steps_per_sec": round(args.steps / dt_compute, 3),
        "e2e_clips_per_sec": round(n * args.batch / dt_e2e, 3),
        "overlap_efficiency": round(dt_compute / dt_e2e, 3),
        "native_loader": bool(args.native),
        "workers": args.workers,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
