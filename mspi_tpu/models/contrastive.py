"""Contrastive / self-supervised pretraining (MoCo, SimCLR, BYOL, SwAV).

Reference: SlowFast/slowfast/models/contrastive.py:32-1166 — the vendored
framework ships SSL pretraining for its video trunks.  This module provides
the same capability on top of the mspi_tpu zoo:

- a projector/predictor MLP head,
- the four objectives as pure jnp losses,
- functional momentum-encoder update (EMA over param pytrees) and a MoCo
  negative queue carried in train state (no in-place buffers).

Distributed notes: the reference all-gathers keys across GPUs with
autograd-aware GatherLayer (distributed.py:267-309); under pjit the batch is
globally visible, so gathering is a no-op and the losses below see the full
global batch automatically.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import dense, layernorm


class ProjectionMLP(nn.Module):
    """SSL projector: Linear-LN-ReLU x (n-1) -> Linear (contrastive.py heads)."""

    dim_in: int
    dim_hidden: int = 2048
    dim_out: int = 128
    num_layers: int = 3

    def setup(self):
        dims = [self.dim_in] + [self.dim_hidden] * (self.num_layers - 1) + [self.dim_out]
        self.layers_list = [dense(dims[i], dims[i + 1]) for i in range(len(dims) - 1)]
        self.norms = [layernorm() for _ in range(len(dims) - 2)]

    def __call__(self, x):
        for i, layer in enumerate(self.layers_list[:-1]):
            x = jax.nn.relu(self.norms[i](layer(x)))
        return self.layers_list[-1](x)


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def nt_xent_loss(z1: jnp.ndarray, z2: jnp.ndarray, temperature: float = 0.1):
    """SimCLR NT-Xent over the (global) batch."""
    z1, z2 = _l2norm(z1), _l2norm(z2)
    B = z1.shape[0]
    z = jnp.concatenate([z1, z2], axis=0)
    sim = z @ z.T / temperature
    sim = sim - 1e9 * jnp.eye(2 * B)
    targets = jnp.concatenate([jnp.arange(B) + B, jnp.arange(B)])
    return jnp.mean(-jax.nn.log_softmax(sim, axis=-1)[jnp.arange(2 * B), targets])


def moco_loss(q: jnp.ndarray, k: jnp.ndarray, queue: jnp.ndarray,
              temperature: float = 0.07):
    """MoCo InfoNCE: positives = momentum keys, negatives = queue."""
    q, k = _l2norm(q), _l2norm(jax.lax.stop_gradient(k))
    l_pos = jnp.sum(q * k, axis=-1, keepdims=True)
    l_neg = q @ _l2norm(queue).T
    logits = jnp.concatenate([l_pos, l_neg], axis=1) / temperature
    return jnp.mean(-jax.nn.log_softmax(logits, axis=-1)[:, 0])


def byol_loss(p1, z2, p2, z1):
    """BYOL symmetric negative cosine (predictions vs stop-grad targets)."""

    def d(p, z):
        return 2 - 2 * jnp.sum(_l2norm(p) * _l2norm(jax.lax.stop_gradient(z)), axis=-1)

    return jnp.mean(d(p1, z2) + d(p2, z1)) * 0.5


def sinkhorn(scores: jnp.ndarray, eps: float = 0.05, n_iters: int = 3):
    """SwAV Sinkhorn-Knopp assignment (contrastive.py sinkhorn)."""
    tiny = jnp.finfo(scores.dtype).tiny
    scaled = scores / eps
    scaled = scaled - jnp.max(scaled)  # stabilise exp
    Q = jnp.exp(scaled).T  # [K, B]
    Q = Q / jnp.maximum(jnp.sum(Q), tiny)
    K, B = Q.shape
    for _ in range(n_iters):
        Q = Q / jnp.maximum(jnp.sum(Q, axis=1, keepdims=True), tiny) / K
        Q = Q / jnp.maximum(jnp.sum(Q, axis=0, keepdims=True), tiny) / B
    return (Q * B).T


def swav_loss(z1: jnp.ndarray, z2: jnp.ndarray, prototypes: jnp.ndarray,
              temperature: float = 0.1):
    """SwAV swapped prediction with Sinkhorn targets."""
    p = _l2norm(prototypes, axis=-1)
    s1 = _l2norm(z1) @ p.T
    s2 = _l2norm(z2) @ p.T
    q1 = jax.lax.stop_gradient(sinkhorn(s1))
    q2 = jax.lax.stop_gradient(sinkhorn(s2))
    l1 = -jnp.mean(jnp.sum(q2 * jax.nn.log_softmax(s1 / temperature, axis=-1), axis=-1))
    l2 = -jnp.mean(jnp.sum(q1 * jax.nn.log_softmax(s2 / temperature, axis=-1), axis=-1))
    return (l1 + l2) * 0.5


def momentum_update(online_params: Any, momentum_params: Any, m: float = 0.994) -> Any:
    """EMA update of the momentum encoder (contrastive.py _update_momentum)."""
    return jax.tree.map(lambda o, t: m * t + (1.0 - m) * o,
                        online_params, momentum_params)


def queue_update(queue: jnp.ndarray, keys: jnp.ndarray, ptr: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Functional MoCo queue: overwrite at ptr, advance modulo capacity."""
    B = keys.shape[0]
    K = queue.shape[0]
    queue = jax.lax.dynamic_update_slice(queue, _l2norm(keys), (ptr, 0))
    return queue, (ptr + B) % K
