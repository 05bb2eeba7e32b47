"""Full contrastive SSL trainer: loss decreases per objective on synthetic
clips; momentum trunk / queue / prototypes / kNN monitor semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from mspi_tpu.train.ssl import (ContrastiveNet, SSLTrainState, create_ssl_state,
                                eval_knn, knn_mem_create, knn_mem_update,
                                make_ssl_train_step, momentum_anneal_cosine)


class TinyTrunk(nn.Module):
    @nn.compact
    def __call__(self, clips, train=False):
        x = nn.Conv(8, (2, 4, 4), strides=(2, 4, 4))(clips)
        x = nn.relu(x)
        x = nn.Conv(16, (1, 2, 2), strides=(1, 2, 2))(x)
        return [nn.relu(x)]


def _model(objective):
    return ContrastiveNet(
        trunk=TinyTrunk(), dim_in=16, dim_hidden=32, dim_out=8,
        use_predictor=objective in ("moco", "byol"),
        num_prototypes=12 if objective == "swav" else 0)


def _batch(rng, B=4):
    base = rng.standard_normal((B, 4, 16, 16, 3)).astype(np.float32)
    aug1 = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    aug2 = base + 0.05 * rng.standard_normal(base.shape).astype(np.float32)
    return {"clips1": jnp.asarray(aug1), "clips2": jnp.asarray(aug2)}


@pytest.mark.parametrize("objective", ["moco", "simclr", "byol", "swav"])
def test_ssl_objective_loss_decreases(rng, objective):
    model = _model(objective)
    batch = _batch(rng)
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3,
                                               weight_decay=0.0)
    state = create_ssl_state(model, tx, batch["clips1"], queue_size=64)
    step = make_ssl_train_step(model, tx, objective, momentum=0.9, jit=True)
    losses = []
    for _ in range(6):
        state, loss = step(state, batch, 1e-3)
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses
    assert losses[-1] < losses[0], (objective, losses)


def test_moco_queue_and_momentum_semantics(rng):
    model = _model("moco")
    batch = _batch(rng)
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-3,
                                               weight_decay=0.0)
    state = create_ssl_state(model, tx, batch["clips1"], queue_size=16)
    q0 = np.asarray(state.queue).copy()
    mp0 = np.asarray(jax.tree.leaves(state.momentum_params)[0]).copy()
    step = make_ssl_train_step(model, tx, "moco", momentum=0.9, jit=False)
    state, _ = step(state, batch, 1e-3)
    # queue advanced by batch size, first B rows replaced by unit keys
    assert int(state.queue_ptr) == 4
    rows = np.asarray(state.queue[:4])
    np.testing.assert_allclose(np.linalg.norm(rows, axis=-1), 1.0, atol=1e-5)
    assert not np.allclose(rows, q0[:4])
    assert np.allclose(np.asarray(state.queue[4:]), q0[4:])
    # momentum params moved toward online params but are not equal to them
    mp1 = np.asarray(jax.tree.leaves(state.momentum_params)[0])
    p1 = np.asarray(jax.tree.leaves(state.params)[0])
    assert not np.allclose(mp1, mp0) and not np.allclose(mp1, p1)


def test_swav_prototypes_stay_normalised(rng):
    model = _model("swav")
    batch = _batch(rng)
    tx = optax.inject_hyperparams(optax.adamw)(learning_rate=1e-2,
                                               weight_decay=0.0)
    state = create_ssl_state(model, tx, batch["clips1"], queue_size=0)
    step = make_ssl_train_step(model, tx, "swav", jit=False)
    state, _ = step(state, batch, 1e-2)
    norms = np.linalg.norm(np.asarray(state.params["prototypes"]), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_momentum_anneal_cosine():
    m = momentum_anneal_cosine(0.99, 0.0, 100.0)
    assert abs(float(m) - 0.99) < 1e-6
    m_end = momentum_anneal_cosine(0.99, 100.0, 100.0)
    assert abs(float(m_end) - 1.0) < 1e-6


def test_knn_monitor(rng):
    # two well-separated clusters in embedding space
    dim, n = 8, 40
    mem = knn_mem_create(n, dim)
    labels = jnp.asarray(np.array([0] * 20 + [1] * 20))
    c0 = np.zeros(dim, np.float32); c0[0] = 1
    c1 = np.zeros(dim, np.float32); c1[1] = 1
    emb = np.stack([c0 + 0.01 * rng.standard_normal(dim) for _ in range(20)] +
                   [c1 + 0.01 * rng.standard_normal(dim) for _ in range(20)]
                   ).astype(np.float32)
    mem = knn_mem_update(mem, jnp.asarray(emb), jnp.arange(n))
    queries = jnp.asarray(np.stack([c0, c1]).astype(np.float32))
    pred = eval_knn(queries, mem, labels, knn_k=5, num_classes=2)
    assert pred.tolist() == [0, 1]
