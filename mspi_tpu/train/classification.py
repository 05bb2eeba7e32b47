"""Video-classification training / testing engine (run_net capability).

Reference: SlowFast/tools/train_net.py:33-778 (train_epoch / eval_epoch /
full train loop with AMP + meters) and tools/test_net.py:25-284
(perform_test with multi-view TestMeter ensembling).

TPU-native: one jitted train step (soft-CE or CE loss + optimizer update),
DP over the mesh via batch sharding; "AMP" is bfloat16 compute (no loss
scaling needed — bf16 keeps fp32 range).
"""

from __future__ import annotations

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


def make_cls_train_step(model, tx, label_smoothing: float = 0.0):
    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, updates = model.apply(
            variables, batch["clips"], train=True, rng=rng,
            mutable=["batch_stats"], rngs={"dropout": rng})
        loss = cross_entropy(logits, batch["labels"], label_smoothing)
        return loss, (logits, updates["batch_stats"])

    def train_step(state: ClsTrainState, batch, lr):
        rng, step_rng = jax.random.split(state.rng)
        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, step_rng)
        state.opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             batch_stats=new_bs, rng=rng), loss, logits

    return jax.jit(train_step, donate_argnums=(0,))


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


def perform_test(state, eval_step, loader, num_videos, num_clips, num_cls):
    """tools/test_net.py:25-163: multi-view ensemble evaluation."""
    meter = TestMeter(num_videos, num_clips, num_cls)
    for batch in loader:
        preds = eval_step(state, jnp.asarray(batch["clips"], jnp.float32))
        meter.update_stats(np.asarray(preds), np.asarray(batch["labels"]),
                           np.asarray(batch["indices"]))
    return meter.finalize_metrics()
