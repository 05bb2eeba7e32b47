"""SubBatchNorm vs torch per-split BN; weight-inflation utilities; XLA cost
analysis smoke test."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mspi_tpu.convert.inflate import (inflate_conv2d_to_3d,
                                      interpolate_pos_embed,
                                      interpolate_rel_pos)
from mspi_tpu.ops.subbn import SubBatchNorm


def test_subbn_train_matches_per_split_torch(rng):
    C, splits, sub = 6, 2, 4
    x = rng.standard_normal((splits * sub, 2, 3, 3, C)).astype(np.float32)

    model = SubBatchNorm(num_features=C, num_splits=splits)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           use_running_average=False)
    y, updates = model.apply(variables, jnp.asarray(x),
                             use_running_average=False,
                             mutable=["batch_stats"])

    # torch: BN each split independently (batchnorm_helper semantics)
    bn = torch.nn.BatchNorm3d(C)
    bn.train()
    xt = torch.tensor(np.transpose(x, (0, 4, 1, 2, 3)))
    outs = []
    for s in range(splits):
        bn.reset_running_stats()
        outs.append(bn(xt[s * sub:(s + 1) * sub]).detach())
    ref = torch.cat(outs).numpy()
    np.testing.assert_allclose(np.transpose(np.array(y), (0, 4, 1, 2, 3)), ref,
                               atol=1e-4, rtol=1e-3)

    # eval path: aggregated stats give a finite, correctly-shaped output
    vars2 = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
    y_eval = model.apply(vars2, jnp.asarray(x), use_running_average=True)
    assert np.all(np.isfinite(np.array(y_eval)))


def test_inflate_conv2d(rng):
    k2 = rng.standard_normal((7, 7, 3, 96)).astype(np.float32)
    k3 = inflate_conv2d_to_3d(k2, 2)
    assert k3.shape == (2, 7, 7, 3, 96)
    # mean-preserving: temporal sum == original
    np.testing.assert_allclose(k3.sum(0), k2, atol=1e-6)
    k3c = inflate_conv2d_to_3d(k2, 3, center=True)
    np.testing.assert_allclose(k3c[1], k2)
    assert np.abs(k3c[0]).max() == 0


def test_interpolate_pos_embed(rng):
    pe = rng.standard_normal((1, 1 + 16, 8)).astype(np.float32)
    out = interpolate_pos_embed(pe, 36, num_prefix_tokens=1)
    assert out.shape == (1, 37, 8)
    np.testing.assert_allclose(out[:, 0], pe[:, 0])  # cls token kept


def test_interpolate_rel_pos(rng):
    rp = rng.standard_normal((15, 32)).astype(np.float32)
    out = interpolate_rel_pos(rp, 31)
    assert out.shape == (31, 32)
    assert interpolate_rel_pos(rp, 15) is rp


def test_cost_analysis_smoke():
    from mspi_tpu.utils.profiling import cost_analysis, flop_count_table, param_count

    def f(a, b):
        return a @ b

    a = jnp.ones((64, 64))
    costs = cost_analysis(f, a, a)
    assert costs["flops"] > 0
    assert "GFLOPs" in flop_count_table(f, a, a)
    assert param_count({"w": a}) == 64 * 64


def test_sync_batchnorm_matches_global_bn(rng):
    """sync_batchnorm under pmap over 8 devices == plain BN over the global
    batch (the NaiveSyncBN contract: per-device shards, global statistics)."""
    from mspi_tpu.ops.layers import batchnorm
    from mspi_tpu.ops.subbn import sync_batchnorm

    n_dev = jax.device_count()
    assert n_dev == 8, "conftest should provide 8 CPU devices"
    x = rng.standard_normal((n_dev, 2, 4, 5, 3)).astype(np.float32)

    sync = sync_batchnorm()
    variables = sync.init(jax.random.PRNGKey(0), jnp.asarray(x[0]),
                          use_running_average=True)

    def fwd(xs):
        y, upd = sync.apply(variables, xs, use_running_average=False,
                            mutable=["batch_stats"])
        return y, upd["batch_stats"]

    y_sync, stats = jax.pmap(fwd, axis_name="data")(jnp.asarray(x))

    plain = batchnorm()
    flat = jnp.asarray(x.reshape(-1, 4, 5, 3))
    v2 = plain.init(jax.random.PRNGKey(0), flat, use_running_average=True)
    y_ref, upd_ref = plain.apply(v2, flat, use_running_average=False,
                                 mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y_sync).reshape(-1, 4, 5, 3),
                               np.asarray(y_ref), atol=1e-5)
    # running stats identical on every device and equal to the global ones
    for key in ("mean", "var"):
        s = np.asarray(stats[key])
        np.testing.assert_allclose(s, np.broadcast_to(
            np.asarray(upd_ref["batch_stats"][key]), s.shape), atol=1e-5)
