"""MSPI-TPU training CLI.

Mirrors /root/reference/train.py:17-204: same arguments, seed, 6-dataset
mixture, frozen encoders, AdamW(lr 1e-4, wd 0), hand-rolled step-LR
schedule, validation at epochs {60,80,100,120}, JSONL logs, periodic
checkpoints — but the step is one jitted XLA program, data-parallel over a
jax.sharding.Mesh (with optional tensor-parallel axis for the fusion
transformer).

Usage:
  python train.py --motion_encoder s3d --data_root ./AuViDataset --split 1
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--session_name", default="s1_mspi_tpu_epoch120_batch2_16_224_384")
    parser.add_argument("--start_epoch", default=0, type=int)
    parser.add_argument("--split", default=1, type=int)
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--dataset", default="sound", type=str)
    parser.add_argument("--weights", type=str, default="")
    parser.add_argument("--log_dir", type=str, default="./training_logs")
    parser.add_argument("--save_ckpt", default=True, type=bool)
    parser.add_argument("--save_ckpt_freq", default=10, type=int)
    parser.add_argument("--gamma", default=1.0, type=float)
    # TPU-native extensions
    parser.add_argument("--motion_encoder", default="mvitv2s", type=str)
    parser.add_argument("--data_root", default="./AuViDataset", type=str)
    parser.add_argument("--batch_size", default=None, type=int)
    parser.add_argument("--epochs", default=None, type=int)
    parser.add_argument("--dp", default=None, type=int, help="data-parallel mesh size")
    parser.add_argument("--tp", default=1, type=int, help="tensor-parallel mesh size")
    parser.add_argument("--auto_resume", default=True, type=bool)
    parser.add_argument("--resolution", default=None, nargs=2, type=int,
                        help="override (H W), e.g. for smoke runs")
    parser.add_argument("--monitored_epochs", default=None, nargs="+", type=int)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (params/optimizer stay fp32)")
    parser.add_argument("--remat", action="store_true",
                        help="rematerialise transformer blocks (activation memory)")
    return parser.parse_args()


def main():
    args = parse_args()

    from mspi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mspi_tpu.parallel import maybe_init_distributed

    maybe_init_distributed()  # multi-host: no-op unless MSPI_COORDINATOR set

    from mspi_tpu.config import get_config
    from mspi_tpu.data.datasets import build_training_datasets
    from mspi_tpu.data.loader import DataLoader
    from mspi_tpu.data.video import normalize_clip_jax
    from mspi_tpu.models.fusion import AudioVisualSaliencyModel, VisualSaliencyModel
    from mspi_tpu.parallel import batch_sharding, create_mesh, param_shardings
    from mspi_tpu.train import checkpoints as ckpt_lib
    from mspi_tpu.train.engine import (create_train_state, make_eval_step,
                                       make_optimizer, make_train_step,
                                       step_lr_schedule)
    from mspi_tpu.utils.logging import MetricLogger, append_jsonl

    if args.bf16:
        from mspi_tpu.ops.layers import set_default_compute_dtype

        set_default_compute_dtype(jnp.bfloat16)
    cfg = get_config(args.motion_encoder, overrides={
        "model": {"remat": bool(args.remat)},
        "data": {"root": args.data_root,
                 **({"resolution": tuple(args.resolution)} if args.resolution else {})},
        "train": {"gamma": args.gamma,
                  **({"batch_size": args.batch_size} if args.batch_size else {})},
        "solver": {**({"max_epoch": args.epochs} if args.epochs else {}),
                   **({"monitored_epochs": tuple(args.monitored_epochs)}
                      if args.monitored_epochs else {})},
    })
    use_sound = cfg.data.use_sound and args.dataset == "sound"

    seed = cfg.train.seed  # 2023, train.py:36
    np.random.seed(seed)

    # Log/checkpoint directories (train.py:45-66)
    prefix = args.session_name
    log_dir = os.path.join(args.log_dir, time.strftime(prefix + "_%Y%m%d-%H%M%S"))
    checkpoint_dir = os.path.join(log_dir, "checkpoints")
    log_path = os.path.join(log_dir, "log")
    os.makedirs(checkpoint_dir, exist_ok=True)
    os.makedirs(log_path, exist_ok=True)

    # Data (train.py:69-137)
    dataset_train, dataset_val = build_training_datasets(
        cfg.data.root, args.split, cfg.data.num_frames, use_sound,
        cfg.data.resolution, seed=seed)
    loader_train = DataLoader(dataset_train, cfg.train.batch_size, shuffle=True,
                              drop_last=True, num_workers=args.num_workers, seed=seed)
    loader_val = DataLoader(dataset_val, 1, num_workers=args.num_workers)
    steps_per_epoch = len(dataset_train) // cfg.train.batch_size

    # Model
    model_cls = AudioVisualSaliencyModel if use_sound else VisualSaliencyModel
    model = model_cls(cfg=cfg)
    h, w = cfg.data.resolution
    sample_clips = jnp.zeros((1, cfg.data.num_frames, h, w, 3), jnp.float32)
    sample_audio = jnp.zeros((1, *cfg.data.spectro_shape, 1), jnp.float32)
    init_args = (sample_clips, sample_audio) if use_sound else (sample_clips,)
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), *init_args)
    variables = jax.tree.map(np.asarray, variables)
    variables = ckpt_lib.load_pretrained_encoders(cfg, variables)
    if args.weights:
        from mspi_tpu.convert import convert_state_dict, load_torch_checkpoint, merge_converted

        sd = load_torch_checkpoint(args.weights)
        conv = convert_state_dict(sd)
        variables = {c: merge_converted(variables[c], conv.get(c, {}), strict=False)
                     for c in variables}

    # Mesh + shardings
    import math as _math

    n_dev = len(jax.devices())
    dp = args.dp or (n_dev // args.tp)
    # the DP axis must divide the global batch; shrink it if needed
    dp = _math.gcd(dp, cfg.train.batch_size) or 1
    mesh = create_mesh((dp, args.tp),
                       devices=jax.devices()[: dp * args.tp])
    tx = make_optimizer(cfg)
    state = create_train_state(cfg, variables, tx)
    shardings = param_shardings(mesh, state)
    state = jax.device_put(state, shardings)
    b_shard = lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x)))

    start_epoch = args.start_epoch
    if args.auto_resume:
        latest = ckpt_lib.latest_checkpoint(checkpoint_dir)
        if latest:
            state, start_epoch = ckpt_lib.restore_checkpoint(latest, state)
            print(f"Auto-resumed from {latest} at epoch {start_epoch}")

    train_step = make_train_step(model, tx, gamma=args.gamma, use_sound=use_sound)
    eval_step = make_eval_step(model, use_sound=use_sound)

    lr_by_epoch = step_lr_schedule(cfg.solver.lr, cfg.solver.max_epoch)
    n_parameters = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"trainable parameters: {n_parameters/1e6:.2f}M; mesh {mesh.shape}")

    def device_batch(batch):
        out = {"gt": b_shard(jnp.asarray(batch["gt"]))}
        clips = jnp.asarray(batch["clips"])
        if clips.dtype == jnp.uint8:
            clips = normalize_clip_jax(
                b_shard(clips),
                jnp.bfloat16 if args.bf16 else None)
        else:
            clips = b_shard(clips)
        out["clips"] = clips
        if "audio" in batch and use_sound:
            out["audio"] = b_shard(jnp.asarray(batch["audio"]))
        return out

    best_score = 100.0
    start_time = time.time()
    for epoch in range(start_epoch, cfg.solver.max_epoch):
        lr = lr_by_epoch[epoch]
        logger = MetricLogger()
        for batch in logger.log_every(loader_train, 10, f"Epoch: [{epoch}]"):
            state, metrics = train_step(state, device_batch(batch), lr)
            metrics = jax.device_get(metrics)
            if not np.isfinite(metrics["loss"]):
                raise RuntimeError("Loss is NaN.")  # engine_train.py:50-51
            logger.update(lr=lr, **{k: float(v) for k, v in metrics.items()})
        train_stats = logger.stats()

        if args.save_ckpt and ((epoch + 1) % args.save_ckpt_freq == 0
                               or (epoch + 1) == cfg.solver.max_epoch):
            ckpt_lib.save_checkpoint(checkpoint_dir, state, epoch + 1)

        log_stats = {f"train_{k}": v for k, v in train_stats.items()}
        if epoch + 1 in set(cfg.solver.monitored_epochs):
            vlogger = MetricLogger()
            for batch in vlogger.log_every(loader_val, 10, "Val:"):
                _, aux = eval_step(state, device_batch(batch))
                vlogger.update(**{k: float(v) for k, v in jax.device_get(aux).items()})
            log_stats.update({f"val_{k}": v for k, v in vlogger.stats().items()})
        log_stats.update(epoch=epoch, n_parameters=n_parameters)
        append_jsonl(os.path.join(log_path, "log.txt"), log_stats)

    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")


if __name__ == "__main__":
    main()
