"""Video-classification training / testing engine (run_net capability).

Reference: SlowFast/tools/train_net.py:33-778 (train_epoch / eval_epoch /
full train loop with AMP + meters) and tools/test_net.py:25-284
(perform_test with multi-view TestMeter ensembling).

TPU-native: one jitted train step (soft-CE or CE loss + optimizer update),
DP over the mesh via batch sharding; "AMP" is bfloat16 compute (no loss
scaling needed — bf16 keeps fp32 range).
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mspi_tpu.utils.meters import (TestMeter, TrainMeter, ValMeter,
                                   topk_errors)


class ClsTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: Any


def create_cls_state(model, tx, sample_clips, seed: int = 0) -> ClsTrainState:
    variables = jax.jit(model.init)(jax.random.PRNGKey(seed), sample_clips)
    return ClsTrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        rng=jax.random.PRNGKey(seed),
    )


def cross_entropy(logits, labels, smoothing: float = 0.0):
    n = logits.shape[-1]
    log_p = jax.nn.log_softmax(logits)
    if smoothing > 0:
        one_hot = jax.nn.one_hot(labels, n) * (1 - smoothing) + smoothing / n
        return -jnp.mean(jnp.sum(one_hot * log_p, axis=-1))
    return -jnp.mean(jnp.take_along_axis(log_p, labels[:, None], axis=-1))


def soft_cross_entropy(logits, targets):
    """SoftTargetCrossEntropy for mixed labels (train_net.py:175-186 uses it
    whenever MixUp is enabled)."""
    return -jnp.mean(jnp.sum(targets * jax.nn.log_softmax(logits), axis=-1))


def make_cls_train_step(model, tx, label_smoothing: float = 0.0,
                        mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0,
                        mixup_prob: float = 1.0, switch_prob: float = 0.5,
                        num_classes: Optional[int] = None, mesh=None,
                        data_axis: str = "data"):
    """Jitted classification train step.

    MixUp/CutMix (train_net.py:175-186 + datasets/mixup.py semantics: apply
    with mixup_prob, switch between modes with switch_prob) runs *inside* the
    step on device.  With `mesh`, the step becomes the single-collective
    shard_map DDP program (per-device batch shard, one fused pmean of
    grads+BN-stats+loss — the reference's bucketed DDP all-reduce).
    """
    use_mix = mixup_alpha > 0.0 or cutmix_alpha > 0.0
    if use_mix:
        assert num_classes is not None, "mixup needs num_classes"

    def loss_fn(params, batch_stats, batch, rng):
        from mspi_tpu.data.augment import (cutmix_batch, mixup_batch,
                                           one_hot_smooth)

        clips, labels = batch["clips"], batch["labels"]
        variables = {"params": params, "batch_stats": batch_stats}
        if use_mix:
            k_apply, k_switch, k_mix = jax.random.split(rng, 3)

            def mixed(clips):
                if mixup_alpha > 0.0 and cutmix_alpha > 0.0:
                    return jax.lax.cond(
                        jax.random.uniform(k_switch) < switch_prob,
                        lambda c: cutmix_batch(k_mix, c, labels, num_classes,
                                               cutmix_alpha, label_smoothing),
                        lambda c: mixup_batch(k_mix, c, labels, num_classes,
                                              mixup_alpha, label_smoothing),
                        clips)
                if cutmix_alpha > 0.0:
                    return cutmix_batch(k_mix, clips, labels, num_classes,
                                        cutmix_alpha, label_smoothing)
                return mixup_batch(k_mix, clips, labels, num_classes,
                                   mixup_alpha, label_smoothing)

            plain = one_hot_smooth(labels, num_classes, label_smoothing)
            clips, targets = jax.lax.cond(
                jax.random.uniform(k_apply) < mixup_prob,
                mixed, lambda c: (c, plain), clips)
            logits, updates = model.apply(
                variables, clips, train=True, rng=rng,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss = soft_cross_entropy(logits, targets)
        else:
            logits, updates = model.apply(
                variables, clips, train=True, rng=rng,
                mutable=["batch_stats"], rngs={"dropout": rng})
            loss = cross_entropy(logits, labels, label_smoothing)
        return loss, (logits, updates["batch_stats"])

    def train_step(state: ClsTrainState, batch, lr):
        rng, step_rng = jax.random.split(state.rng)
        if mesh is not None:
            step_rng = jax.random.fold_in(step_rng,
                                          jax.lax.axis_index(data_axis))
        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, step_rng)
        if mesh is not None:
            # the single DDP collective (see engine.make_ddp_train_step)
            grads, new_bs, loss = jax.lax.pmean((grads, new_bs, loss),
                                                data_axis)
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=new_bs, rng=rng), loss, logits

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))
    from jax.sharding import PartitionSpec as P

    mapped = jax.shard_map(
        train_step, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P(), P(data_axis)))
    return jax.jit(mapped, donate_argnums=(0,))


def make_cls_eval_step(model):
    def eval_step(state: ClsTrainState, clips):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        return model.apply(variables, clips, train=False)

    return jax.jit(eval_step)


def train_epoch(state, train_step, loader, lr_policy, cur_epoch, steps_per_epoch,
                meter: Optional[TrainMeter] = None):
    """tools/train_net.py:33-285 equivalent (per-iteration LR)."""
    meter = meter or TrainMeter(steps_per_epoch)
    for it, batch in enumerate(loader):
        lr = lr_policy(cur_epoch + it / steps_per_epoch)
        dev_batch = {"clips": jnp.asarray(batch["clips"], jnp.float32),
                     "labels": jnp.asarray(batch["labels"])}
        state, loss, logits = train_step(state, dev_batch, lr)
        top1, top5 = topk_errors(np.asarray(logits), np.asarray(batch["labels"]), (1, 5))
        meter.update_stats(top1, top5, float(loss), lr, len(batch["labels"]))
        meter.log_iter_stats(cur_epoch, it)
    return state, meter.get_epoch_stats(cur_epoch)


def eval_epoch(state, eval_step, loader, cur_epoch, max_iter,
               meter: Optional[ValMeter] = None):
    meter = meter or ValMeter(max_iter)
    for batch in loader:
        preds = eval_step(state, jnp.asarray(batch["clips"], jnp.float32))
        top1, top5 = topk_errors(np.asarray(preds), np.asarray(batch["labels"]), (1, 5))
        meter.update_stats(top1, top5, len(batch["labels"]))
    return meter.get_epoch_stats(cur_epoch)


def save_cls_checkpoint(ckpt_dir, state: ClsTrainState, epoch: int):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"ckpt_{epoch}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": state.params, "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state,
                      "rng": np.asarray(state.rng), "epoch": np.asarray(epoch)})
    ckptr.wait_until_finished()
    return path


def restore_latest_cls_checkpoint(ckpt_dir, state: ClsTrainState):
    """TRAIN.AUTO_RESUME (train_net.py:551-563): pick up the newest epoch."""
    import orbax.checkpoint as ocp

    from mspi_tpu.train.checkpoints import latest_checkpoint

    path = latest_checkpoint(ckpt_dir)
    if path is None:
        return state, 0
    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "batch_stats": state.batch_stats,
              "opt_state": state.opt_state, "rng": np.asarray(state.rng),
              "epoch": np.asarray(0)}
    r = ckptr.restore(os.path.abspath(path), target)
    return state.replace(params=r["params"], batch_stats=r["batch_stats"],
                         opt_state=r["opt_state"],
                         rng=jnp.asarray(r["rng"])), int(r["epoch"]) + 1


def run_classification_training(
        model, tx, make_dataset, epochs: int, batch_size: int,
        lr_policy, base_t: int, base_crop: int,
        label_smoothing: float = 0.0,
        mixup_alpha: float = 0.0, cutmix_alpha: float = 0.0,
        num_classes: Optional[int] = None,
        multigrid: bool = False,
        precise_bn_batches: int = 0,
        ckpt_dir: Optional[str] = None, auto_resume: bool = False,
        tb_dir: Optional[str] = None,
        mesh=None, eval_every: int = 1, seed: int = 0,
        log: Callable[[str], None] = print):
    """The reference's full train loop (train_net.py:512-778) in one place:
    mixup inside the jitted step, multigrid long-cycle shape rebuilds,
    precise-BN before eval, epoch checkpoints + auto-resume, TensorBoard
    scalars, DP mesh sharding.

    make_dataset(split, num_frames, crop_size) -> map-style dataset yielding
    dicts with 'clips' (uint8/float [T,H,W,3]) and 'labels'.
    """
    from mspi_tpu.data.video import normalize_frames
    from mspi_tpu.train.multigrid import MultigridSchedule
    from mspi_tpu.train.precise_bn import update_precise_bn

    rng = np.random.default_rng(seed)
    writer = None
    if tb_dir:
        from mspi_tpu.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(tb_dir)

    schedule = None
    if multigrid:
        schedule = MultigridSchedule().schedule(epochs, base_t, base_crop,
                                                batch_size)

    sample_ds = make_dataset("train", base_t, base_crop)
    sample = jnp.asarray(normalize_frames(
        np.stack([sample_ds[0]["clips"]])), jnp.float32)
    state = create_cls_state(model, tx, sample, seed=seed)
    start_epoch = 0
    if ckpt_dir and auto_resume:
        state, start_epoch = restore_latest_cls_checkpoint(ckpt_dir, state)
        if start_epoch:
            log(f"auto-resumed from epoch {start_epoch - 1}")
    shard_batch = lambda x: x
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        state = jax.device_put(state, NamedSharding(mesh, P()))
        shard_batch = lambda x: jax.device_put(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    # one train step per (shape) — XLA caches compiles per distinct shape
    step_cache = {}

    def get_step():
        key = "step"
        if key not in step_cache:
            step_cache[key] = make_cls_train_step(
                model, tx, label_smoothing=label_smoothing,
                mixup_alpha=mixup_alpha, cutmix_alpha=cutmix_alpha,
                num_classes=num_classes, mesh=mesh)
        return step_cache[key]

    eval_step = make_cls_eval_step(model)
    history = []
    for epoch in range(start_epoch, epochs):
        t, crop, bsz = base_t, base_crop, batch_size
        if schedule is not None:
            bsz, t, crop = MultigridSchedule().get_current(schedule, epoch)
            bsz = max(1, bsz)
        train_ds = make_dataset("train", t, crop)
        bsz = min(bsz, len(train_ds))
        if mesh is not None:  # keep the batch divisible over the data axis
            dp = mesh.shape["data"]
            bsz = max(dp, (bsz // dp) * dp)
        lr = lr_policy(epoch)

        def loader(ds=train_ds, bsz=bsz, shuffle=True):
            order = np.arange(len(ds))
            if shuffle:
                rng.shuffle(order)
            for b in range(max(1, len(ds) // bsz)):
                idxs = order[b * bsz:(b + 1) * bsz]
                if len(idxs) < bsz:
                    break
                samples = [ds[int(i)] for i in idxs]
                yield {"clips": shard_batch(jnp.asarray(normalize_frames(
                            np.stack([s["clips"] for s in samples])), jnp.float32)),
                       "labels": shard_batch(jnp.asarray(
                            [s["labels"] for s in samples]))}

        step = get_step()
        steps_per_epoch = max(1, len(train_ds) // bsz)
        losses = []
        for it, batch in enumerate(loader()):
            lr = lr_policy(epoch + it / steps_per_epoch)
            state, loss, logits = step(state, batch, lr)
            losses.append(float(loss))
        stats = {"epoch": epoch, "loss": float(np.mean(losses)), "lr": lr,
                 "t": t, "crop": crop, "batch": bsz}
        history.append(stats)
        log(f"train epoch {epoch}: {stats}")
        if writer:
            writer.add_scalars({"train/loss": stats["loss"],
                                "train/lr": lr}, step=epoch)

        if (epoch + 1) % eval_every == 0 or epoch == epochs - 1:
            if precise_bn_batches > 0 and state.batch_stats:
                # train_net.py:442-464 calculate_and_update_precise_bn
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                variables = update_precise_bn(
                    model, variables,
                    loader(train_ds, bsz, shuffle=False),
                    make_args=lambda b: (b["clips"],),
                    num_batches=precise_bn_batches)
                state = state.replace(batch_stats=variables["batch_stats"])
            val_ds = make_dataset("val", base_t, base_crop)
            errs = []
            for batch in loader(val_ds, batch_size, shuffle=False):
                preds = eval_step(state, batch["clips"])
                errs.append(topk_errors(np.asarray(preds),
                                        np.asarray(batch["labels"]), (1, 5)))
            if errs:
                top1 = float(np.mean([e[0] for e in errs]))
                stats["val_top1_err"] = top1
                log(f"val epoch {epoch}: top1_err={top1:.2f}")
                if writer:
                    writer.add_scalar("val/top1_err", top1, step=epoch)
        if ckpt_dir:
            save_cls_checkpoint(ckpt_dir, state, epoch)
    if writer:
        writer.close()
    return state, history


def perform_test(state, eval_step, loader, num_videos, num_clips, num_cls):
    """tools/test_net.py:25-163: multi-view ensemble evaluation."""
    meter = TestMeter(num_videos, num_clips, num_cls)
    for batch in loader:
        preds = eval_step(state, jnp.asarray(batch["clips"], jnp.float32))
        meter.update_stats(np.asarray(preds), np.asarray(batch["labels"]),
                           np.asarray(batch["indices"]))
    return meter.finalize_metrics()
