"""Jitted training / evaluation engine.

Reference: /root/reference/engine_train.py (train_one_epoch /
validation_one_epoch) + train.py:144-200 (optimizer, freeze, LR schedule).

TPU-native design: one jitted, donated train step containing the full model
forward, loss (SalLoss + gamma * SimSiam), backward and AdamW update;
data-parallel gradient reduction comes from the batch sharding (XLA inserts
the psum — the reference's DDP/NCCL equivalent).  The frozen encoders
(audnet + image_encoder, train.py:151-155) are excluded from the grad
computation via stop_gradient so XLA prunes their backward entirely, and the
optimizer only sees trainable leaves.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mspi_tpu.config import MSPIConfig
from mspi_tpu.train.loss import sal_loss

FROZEN_TOPLEVEL = ("audnet", "image_encoder")  # train.py:151-155


def split_frozen(params: Dict[str, Any]) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    trainable = {k: v for k, v in params.items() if k not in FROZEN_TOPLEVEL}
    frozen = {k: v for k, v in params.items() if k in FROZEN_TOPLEVEL}
    return trainable, frozen


def step_lr_schedule(base_lr: float, max_epoch: int) -> list:
    """train.py:161-166: base LR for 60 epochs, then x0.1, then x0.1 again
    every further 60."""
    values = [base_lr] * min(60, max_epoch)
    lr = base_lr * 0.1
    for i in range(max_epoch - 60):
        values.append(lr)
        if (i + 1) % 60 == 0:
            lr *= 0.1
    return values[:max_epoch]


class TrainState(struct.PyTreeNode):
    params: Any          # trainable params
    frozen: Any          # frozen params (audnet, image_encoder)
    batch_stats: Any
    opt_state: Any
    epoch: jnp.ndarray   # scalar int32 (for checkpoint resume)
    rng: Any = None      # dropout / stochastic-depth key

    def variables(self):
        return {"params": {**self.params, **self.frozen},
                "batch_stats": self.batch_stats}


def make_optimizer(cfg: MSPIConfig) -> optax.GradientTransformation:
    """AdamW(lr injected per-step, weight_decay=0) — train.py:158."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.solver.lr, weight_decay=cfg.solver.weight_decay
    )


def create_train_state(cfg: MSPIConfig, variables: Dict[str, Any],
                       tx: optax.GradientTransformation) -> TrainState:
    trainable, frozen = split_frozen(variables["params"])
    return TrainState(
        params=trainable,
        frozen=frozen,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(trainable),
        epoch=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(cfg.train.seed),
    )


def _make_loss_fn(model, gamma: float, use_sound: bool):
    def loss_fn(params, frozen, batch_stats, batch, dropout_rng):
        variables = {
            "params": {**params, **jax.lax.stop_gradient(frozen)},
            "batch_stats": batch_stats,
        }
        rngs = {"dropout": dropout_rng}
        if use_sound:
            (out, loss_va), updates = model.apply(
                variables, batch["clips"], batch["audio"], train=True,
                mutable=["batch_stats"], rngs=rngs)
        else:
            (out, loss_va), updates = model.apply(
                variables, batch["clips"], train=True, mutable=["batch_stats"],
                rngs=rngs)
        loss_sal, aux = sal_loss(out, batch["gt"])
        loss = loss_sal + gamma * loss_va
        aux = dict(aux, loss_va=loss_va, loss=loss)
        return loss, (aux, updates["batch_stats"])

    return loss_fn


def make_train_step(model, tx: optax.GradientTransformation, gamma: float,
                    use_sound: bool = True, donate: bool = True,
                    jit: bool = True):
    """Returns jitted (state, batch, lr) -> (state, metrics).

    batch: dict(clips [B,T,H,W,3] float32, audio [B,F,Tw,1], gt [B,H,W]).
    jit=False returns the raw step (for embedding in an outer program,
    e.g. a fori_loop benchmark or a custom scan).
    """
    loss_fn = _make_loss_fn(model, gamma, use_sound)

    def train_step(state: TrainState, batch, lr):
        rng, dropout_rng = jax.random.split(state.rng)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (aux, new_bs)), grads = grad_fn(
            state.params, state.frozen, state.batch_stats, batch, dropout_rng)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  batch_stats=new_bs, rng=rng)
        metrics = {k: v for k, v in aux.items()}
        metrics["grad_norm"] = gnorm
        return new_state, metrics

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_ddp_train_step(model, tx: optax.GradientTransformation, gamma: float,
                        mesh, use_sound: bool = True, donate: bool = True,
                        data_axis: str = "data"):
    """DDP train step with exactly ONE collective per step.

    The reference's DDP (SlowFast/slowfast/utils/distributed.py:25-64 +
    models/build.py) runs per-rank forward/backward with local BatchNorm
    stats and a single bucketed gradient all-reduce.  The TPU-native
    equivalent: `jax.shard_map` over the 'data' mesh axis — per-device
    forward/backward on the local batch shard, then one fused
    `lax.pmean((grads, batch_stats, metrics))`, which lowers to a single
    tuple all-reduce over ICI (and a single rendezvous on a CPU-thread
    mesh, unlike GSPMD's per-BN / per-parameter collectives).  The AdamW
    update runs redundantly on every device on the replicated params —
    free, since params are needed everywhere anyway.
    """
    from jax.sharding import PartitionSpec as P

    loss_fn = _make_loss_fn(model, gamma, use_sound)

    def local_step(state: TrainState, batch, lr):
        rng, dropout_rng = jax.random.split(state.rng)
        # per-device dropout mask, like per-rank torch RNG under DDP
        dropout_rng = jax.random.fold_in(
            dropout_rng, jax.lax.axis_index(data_axis))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (aux, new_bs)), grads = grad_fn(
            state.params, state.frozen, state.batch_stats, batch, dropout_rng)
        # the single collective: grads + BN stats + scalar metrics together
        grads, new_bs, aux = jax.lax.pmean((grads, new_bs, aux), data_axis)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(aux)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = state.replace(params=params, opt_state=opt_state,
                                  batch_stats=new_bs, rng=rng)
        return new_state, metrics

    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # annotation (jax 0.9 rejects them under shard_map otherwise); the
    # per-device step is replicated-in/replicated-out by construction.
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(data_axis), P()),
        out_specs=(P(), P()), check_vma=False)
    return jax.jit(mapped, donate_argnums=(0,) if donate else ())


def make_eval_step(model, use_sound: bool = True):
    """Jitted validation step (engine_train.py:84-125): eval-mode forward +
    SalLoss metrics."""

    def eval_step(state: TrainState, batch):
        variables = state.variables()
        if use_sound:
            out, _ = model.apply(variables, batch["clips"], batch["audio"], train=False)
        else:
            out, _ = model.apply(variables, batch["clips"], train=False)
        _, aux = sal_loss(out, batch["gt"])
        return out, aux

    return jax.jit(eval_step)
