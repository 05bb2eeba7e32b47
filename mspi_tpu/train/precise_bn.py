"""Precise BatchNorm statistics.

Reference: SlowFast/tools/train_net.py:442-464 (calculate_and_update_
precise_bn via fvcore's update_bn_stats): before eval, re-estimate the BN
running statistics as the *average of true batch statistics* over N batches
instead of the training-time EMA.

Recovering the pure batch statistic from flax BN (which only exposes the
EMA write `new = m*old + (1-m)*batch`) without knowing each module's
momentum: two passes over one batch,
  pass A with old = 0:   nA = (1-m) * batch
  pass B with old = 1:   nB = m + (1-m) * batch
gives m = nB - nA per leaf (exact), after which batch = nA / (1-m).
m is a static per-leaf constant, so this calibration runs once.
"""

from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp


def _run(model, params, batch_stats, args):
    _, updates = model.apply({"params": params, "batch_stats": batch_stats},
                             *args, train=True, mutable=["batch_stats"])
    return updates["batch_stats"]


def calibrate_momentum(model, variables, args):
    """Per-leaf EMA factor m (static)."""
    zeros = jax.tree.map(jnp.zeros_like, variables["batch_stats"])
    ones = jax.tree.map(jnp.ones_like, variables["batch_stats"])
    nA = _run(model, variables["params"], zeros, args)
    nB = _run(model, variables["params"], ones, args)
    return jax.tree.map(lambda a, b: jnp.clip(b - a, 0.0, 1.0 - 1e-6), nA, nB)


def update_precise_bn(model, variables, batches: Iterable, make_args: Callable,
                      num_batches: int = 200):
    """Returns variables with batch_stats replaced by averaged true batch
    statistics (NUM_BATCHES_PRECISE semantics).

    make_args(batch) -> positional args for model.apply (clips[, audio]).
    """
    momentum = None
    sums = None
    count = 0
    zeros = jax.tree.map(jnp.zeros_like, variables["batch_stats"])
    for i, batch in enumerate(batches):
        if i >= num_batches:
            break
        args = make_args(batch)
        if momentum is None:
            momentum = calibrate_momentum(model, variables, args)
        nA = _run(model, variables["params"], zeros, args)
        batch_stat = jax.tree.map(lambda a, m: a / (1.0 - m), nA, momentum)
        sums = batch_stat if sums is None else jax.tree.map(jnp.add, sums, batch_stat)
        count += 1
    if count == 0:
        return variables
    return {**variables, "batch_stats": jax.tree.map(lambda s: s / count, sums)}
