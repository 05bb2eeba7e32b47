"""Self-supervised contrastive training engine (MoCo / SimCLR / BYOL / SwAV)
with momentum trunk, functional negative queue and a kNN monitor.

Reference: SlowFast/slowfast/models/contrastive.py:32-1166 (ContrastiveModel:
momentum encoder + queue + per-task forward at :373-805, kNN memory
:132-242, momentum annealing :252-262) and tools/train_net.py's
contrastive_forward integration.

TPU-native design:
- the momentum encoder is a *second param pytree* in the train state, updated
  by a pure EMA map (no parameter copying through module buffers);
- the MoCo queue + pointer live in the train state and are updated
  functionally inside the jitted step (dynamic_update_slice) — no in-place
  `register_buffer` mutation;
- the reference's _batch_shuffle/_batch_unshuffle (contrastive.py:175-232)
  exists to decorrelate per-GPU BatchNorm statistics under DDP; under a
  single jitted program BN sees the global batch (or SubBN stats are
  explicitly managed), so no shuffle is needed — noted here for parity
  auditing;
- the kNN memory (contrastive.py Memory1D) is a fixed [N, dim] array updated
  at sample indices, queried with a temperature-weighted vote.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn, struct

from mspi_tpu.models.contrastive import (ProjectionMLP, _l2norm, byol_loss,
                                         moco_loss, momentum_update,
                                         nt_xent_loss, queue_update, swav_loss)

OBJECTIVES = ("moco", "simclr", "byol", "swav")


class ContrastiveNet(nn.Module):
    """Trunk + projector (+ predictor, + SwAV prototypes) — the flax
    equivalent of ContrastiveModel's backbone/head assembly.

    trunk: any module mapping clips -> feature pyramid list or a single
    [B, ..., C] map; features are global-average-pooled before the head."""

    trunk: nn.Module
    dim_in: int
    dim_hidden: int = 2048
    dim_out: int = 128
    use_predictor: bool = False          # BYOL / MoCo-v3 style
    num_prototypes: int = 0              # SwAV

    def setup(self):
        self.projector = ProjectionMLP(dim_in=self.dim_in,
                                       dim_hidden=self.dim_hidden,
                                       dim_out=self.dim_out)
        if self.use_predictor:
            self.predictor = ProjectionMLP(dim_in=self.dim_out,
                                           dim_hidden=self.dim_hidden // 4,
                                           dim_out=self.dim_out, num_layers=2)
        if self.num_prototypes:
            self.prototypes = self.param(
                "prototypes", nn.initializers.normal(0.02),
                (self.num_prototypes, self.dim_out))

    def embed(self, clips, train: bool = False):
        feats = self.trunk(clips, train=train)
        if isinstance(feats, (list, tuple)):
            feats = feats[-1]
        pooled = feats.reshape(feats.shape[0], -1, feats.shape[-1]).mean(axis=1)
        return self.projector(pooled)

    def __call__(self, clips, train: bool = False, predict: bool = False):
        z = self.embed(clips, train=train)
        if predict and self.use_predictor:
            return z, self.predictor(z)
        return z, None


class SSLTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    momentum_params: Any            # EMA trunk+projector (moco/byol)
    momentum_batch_stats: Any
    opt_state: Any
    queue: Any                      # [K, dim] MoCo negatives (or ())
    queue_ptr: Any                  # scalar int32
    rng: Any


def create_ssl_state(model: ContrastiveNet, tx, sample_clips,
                     queue_size: int = 4096, seed: int = 0) -> SSLTrainState:
    # predict=True so the predictor head's params are created at init
    variables = jax.jit(partial(model.init, train=False, predict=True))(
        jax.random.PRNGKey(seed), sample_clips)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    rng = jax.random.PRNGKey(seed)
    queue = jax.random.normal(rng, (queue_size, model.dim_out)) \
        if queue_size else ()
    return SSLTrainState(
        params=params, batch_stats=bs,
        momentum_params=jax.tree.map(jnp.copy, params),
        momentum_batch_stats=jax.tree.map(jnp.copy, bs),
        opt_state=tx.init(params),
        queue=queue, queue_ptr=jnp.zeros((), jnp.int32),
        rng=rng)


def momentum_anneal_cosine(m_base: float, epoch_exact: float,
                           max_epoch: float) -> jnp.ndarray:
    """contrastive.py:252-262: anneal momentum 1->m_base cosine-style."""
    return 1.0 - (1.0 - m_base) * (
        jnp.cos(jnp.pi * epoch_exact / max_epoch) + 1.0) * 0.5


def make_ssl_train_step(model: ContrastiveNet, tx, objective: str,
                        momentum: float = 0.994, temperature: float = 0.07,
                        jit: bool = True):
    """Jitted (state, batch{clips1,clips2}, lr[, mom]) -> (state, metrics).

    moco:   q=online(clips1)[+predictor], k=momentum(clips2), InfoNCE vs queue,
            queue enqueue + EMA update                (contrastive.py:373-520)
    byol:   symmetric predictor-vs-momentum cosine    (:618-660)
    simclr: both crops through online, NT-Xent        (:663-700)
    swav:   swapped-prediction with Sinkhorn targets  (:703-805)
    """
    assert objective in OBJECTIVES, objective

    def apply(params, bstats, clips, train, predict=False, rngs=None):
        out, updates = model.apply(
            {"params": params, "batch_stats": bstats}, clips, train=train,
            predict=predict, mutable=["batch_stats"], rngs=rngs)
        return out, updates["batch_stats"]

    def loss_fn(params, state, batch, mom):
        bstats = state.batch_stats
        metrics = {}
        if objective == "moco":
            (z1, p1), bstats = apply(params, bstats, batch["clips1"], True,
                                     predict=True)
            q = p1 if p1 is not None else z1
            (k, _), _ = apply(state.momentum_params,
                              state.momentum_batch_stats, batch["clips2"],
                              False)
            loss = moco_loss(q, k, state.queue, temperature)
            metrics["keys"] = jax.lax.stop_gradient(k)
        elif objective == "byol":
            (z1, p1), bstats = apply(params, bstats, batch["clips1"], True,
                                     predict=True)
            (z2, p2), bstats = apply(params, bstats, batch["clips2"], True,
                                     predict=True)
            (t1, _), _ = apply(state.momentum_params,
                               state.momentum_batch_stats, batch["clips1"],
                               False)
            (t2, _), _ = apply(state.momentum_params,
                               state.momentum_batch_stats, batch["clips2"],
                               False)
            loss = byol_loss(p1, t2, p2, t1)
        elif objective == "simclr":
            (z1, _), bstats = apply(params, bstats, batch["clips1"], True)
            (z2, _), bstats = apply(params, bstats, batch["clips2"], True)
            loss = nt_xent_loss(z1, z2, temperature)
        else:  # swav
            (z1, _), bstats = apply(params, bstats, batch["clips1"], True)
            (z2, _), bstats = apply(params, bstats, batch["clips2"], True)
            loss = swav_loss(z1, z2, params["prototypes"], temperature)
        return loss, (bstats, metrics)

    def train_step(state: SSLTrainState, batch, lr, mom=None):
        mom = momentum if mom is None else mom
        rng, _ = jax.random.split(state.rng)
        (loss, (bstats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state, batch, mom)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = dict(params=params, opt_state=opt_state, batch_stats=bstats,
                   rng=rng)
        if objective in ("moco", "byol"):
            new["momentum_params"] = momentum_update(
                params, state.momentum_params, mom)
            new["momentum_batch_stats"] = jax.tree.map(
                jnp.copy, bstats) if bstats else state.momentum_batch_stats
        if objective == "moco":
            queue, ptr = queue_update(state.queue, metrics.pop("keys"),
                                      state.queue_ptr)
            new["queue"] = queue
            new["queue_ptr"] = ptr
        elif objective == "swav":
            # keep prototypes on the unit sphere (contrastive.py normalises
            # prototype weights each iteration)
            p = new["params"]
            p = dict(p, prototypes=_l2norm(p["prototypes"], axis=-1))
            new["params"] = p
        return state.replace(**new), loss

    if not jit:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


# ----------------------------------------------------------------- kNN eval

def knn_mem_create(num_samples: int, dim: int) -> jnp.ndarray:
    """Memory1D equivalent: one embedding slot per training sample."""
    mem = jax.random.normal(jax.random.PRNGKey(0), (num_samples, dim))
    return _l2norm(mem, axis=-1)


@jax.jit
def knn_mem_update(mem: jnp.ndarray, embeddings: jnp.ndarray,
                   indices: jnp.ndarray) -> jnp.ndarray:
    """contrastive.py knn_mem_update: write normalised embeddings at the
    sample indices."""
    return mem.at[indices].set(_l2norm(embeddings, axis=-1))


@partial(jax.jit, static_argnames=("knn_k", "num_classes"))
def eval_knn(queries: jnp.ndarray, mem: jnp.ndarray, mem_labels: jnp.ndarray,
             knn_k: int = 200, num_classes: int = 400,
             temperature: float = 0.07) -> jnp.ndarray:
    """contrastive.py eval_knn + train_net.py knn eval: temperature-weighted
    k-nearest-neighbour vote over the memory bank -> predicted class."""
    sim = _l2norm(queries, axis=-1) @ mem.T            # [B, N]
    k = min(knn_k, mem.shape[0])
    top_sim, top_idx = jax.lax.top_k(sim, k)           # [B, k]
    weights = jnp.exp(top_sim / temperature)
    votes = jax.nn.one_hot(mem_labels[top_idx], num_classes) * weights[..., None]
    return jnp.argmax(votes.sum(axis=1), axis=-1)
