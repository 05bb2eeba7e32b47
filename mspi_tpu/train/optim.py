"""Optimizer construction + LR policies (the framework capability surface).

Reference: SlowFast/slowfast/models/optimizer.py:11-149 (construct_optimizer
with param-group surgery: zero weight decay for BN/1-D params, optional
LARS) and SlowFast/slowfast/utils/lr_policy.py:9-88 (cosine / steps_with_
relative_lrs, both with linear warmup), plus utils/optim.py:19-37
(cosine_scheduler by epoch) of the MSPI core.

optax-native: param-group surgery becomes an optax.masked weight-decay
partition computed from the param tree (BN/LayerNorm scales and biases and
any 1-D leaf get wd=0 when zero_wd_1d=True, mirroring ZERO_WD_1D_PARAM).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def lr_cosine(base_lr: float, end_lr: float, max_epoch: float,
              warmup_epochs: float = 0.0, warmup_start_lr: float = 0.0,
              cosine_after_warmup: bool = False) -> Callable[[float], float]:
    """lr_policy.py cosine: optional linear warmup then half-cosine decay."""

    def policy(epoch: float) -> float:
        if warmup_epochs > 0 and epoch < warmup_epochs:
            target = _cosine_value(warmup_epochs)
            alpha = (target - warmup_start_lr) / warmup_epochs
            return warmup_start_lr + epoch * alpha
        return _cosine_value(epoch)

    def _cosine_value(epoch: float) -> float:
        offset = warmup_epochs if cosine_after_warmup else 0.0
        return (end_lr + (base_lr - end_lr)
                * (math.cos(math.pi * (epoch - offset) / (max_epoch - offset)) + 1.0) * 0.5)

    return policy


def lr_steps_with_relative_lrs(base_lr: float, lrs, steps, max_epoch: float,
                               warmup_epochs: float = 0.0,
                               warmup_start_lr: float = 0.0) -> Callable[[float], float]:
    """lr_policy.py steps_with_relative_lrs."""
    steps = list(steps) + [max_epoch]

    def policy(epoch: float) -> float:
        if warmup_epochs > 0 and epoch < warmup_epochs:
            ind = next(i for i, step in enumerate(steps) if warmup_epochs < step) - 1
            target = lrs[ind] * base_lr
            alpha = (target - warmup_start_lr) / warmup_epochs
            return warmup_start_lr + epoch * alpha
        ind = next(i for i, step in enumerate(steps) if epoch < step) - 1
        return lrs[ind] * base_lr

    return policy


def _is_norm_or_1d(path, leaf) -> bool:
    """BN/LN scales+biases and any 1-D param (ZERO_WD_1D_PARAM semantics,
    optimizer.py:38-74)."""
    return jnp.ndim(leaf) <= 1


def wd_mask(params) -> Any:
    """True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda p, x: not _is_norm_or_1d(p, x), params)


def construct_optimizer(
    params,
    optimizing_method: str = "sgd",
    base_lr: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    dampening: float = 0.0,
    nesterov: bool = True,
    zero_wd_1d_param: bool = True,
    betas=(0.9, 0.999),
) -> optax.GradientTransformation:
    """SGD / Adam / AdamW / LARS with the reference's wd partition
    (optimizer.py:11-149).  Learning rate is injected per step
    (inject_hyperparams), so any lr policy above drives it."""
    mask = wd_mask(params) if zero_wd_1d_param else None

    def adamw(learning_rate):
        return optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                           weight_decay=weight_decay, mask=mask)

    def sgd(learning_rate):
        wd = optax.add_decayed_weights(weight_decay, mask) if weight_decay else optax.identity()
        return optax.chain(
            wd,
            optax.sgd(learning_rate, momentum=momentum, nesterov=nesterov),
        )

    def adam(learning_rate):
        wd = optax.add_decayed_weights(weight_decay, mask) if weight_decay else optax.identity()
        return optax.chain(wd, optax.adam(learning_rate, b1=betas[0], b2=betas[1]))

    def lars(learning_rate):
        return optax.lars(learning_rate, weight_decay=weight_decay,
                          weight_decay_mask=mask if mask is not None else True,
                          momentum=momentum, nesterov=nesterov)

    # "mt_adamw" (optimizer.py:132, torch._multi_tensor.AdamW) is a fused
    # CUDA performance variant with identical math; optax.adamw already
    # updates the whole pytree in one fused XLA program, so both names map
    # to the same transformation here.
    factories = {"sgd": sgd, "adam": adam, "adamw": adamw, "lars": lars,
                 "mt_adamw": adamw}
    if optimizing_method not in factories:
        raise NotImplementedError(f"optimizer {optimizing_method!r} not supported")
    return optax.inject_hyperparams(factories[optimizing_method])(learning_rate=base_lr)


def cosine_scheduler(base_value, final_value, epochs, niter_per_ep,
                     warmup_epochs=0, start_warmup_value=0):
    """Per-iteration cosine schedule array (utils/optim.py:19-37)."""
    import numpy as np

    warmup_iters = int(warmup_epochs * niter_per_ep)
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = final_value + 0.5 * (base_value - final_value) * (
        1 + np.cos(np.pi * iters / len(iters)))
    schedule = np.concatenate((warmup, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule
