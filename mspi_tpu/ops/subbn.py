"""Sub-BatchNorm (stat-sharded BN for multigrid / large-batch training).

Reference: SlowFast/slowfast/models/batchnorm_helper.py:40 (SubBatchNorm3d):
during training, normalise each of `num_splits` sub-batches with its own
statistics; a single aggregated BN is used at eval.  The reference
aggregates stats by averaging the split running stats
(checkpoint.py:566-666 re-splits them on load).

Channels-last module: params (scale/bias) are shared; running stats are kept
per split in 'batch_stats' and aggregated on the fly for eval.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SubBatchNorm(nn.Module):
    num_features: int
    num_splits: int = 1
    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool = True) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.num_features,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.num_splits, self.num_features)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.num_splits, self.num_features)))

        if use_running_average:
            m = mean.value.mean(axis=0)
            v = (var.value + mean.value ** 2).mean(axis=0) - m ** 2
            y = (x - m) * jax.lax.rsqrt(v + self.epsilon)
            # stats/scale are fp32 params — cast the result back so bf16
            # activation streams stay bf16 downstream
            return (y * scale + bias).astype(x.dtype)

        B = x.shape[0]
        assert B % self.num_splits == 0, (B, self.num_splits)
        sub = B // self.num_splits
        xs = x.reshape(self.num_splits, sub, *x.shape[1:])
        axes = tuple(range(1, xs.ndim - 1))
        m = xs.mean(axis=axes)                       # [splits, C]
        v = xs.var(axis=axes)
        bshape = (self.num_splits,) + (1,) * (xs.ndim - 2) + (self.num_features,)
        y = (xs - m.reshape(bshape)) * jax.lax.rsqrt(v.reshape(bshape) + self.epsilon)
        y = (y.reshape(B, *x.shape[1:]) * scale + bias).astype(x.dtype)

        if not self.is_initializing():
            mom = self.momentum
            mean.value = (1 - mom) * mean.value + mom * m
            # torch tracks the unbiased batch variance in running_var
            n = sub * int(jnp.prod(jnp.asarray(x.shape[1:-1])))
            unbiased = v * n / max(n - 1, 1)
            var.value = (1 - mom) * var.value + mom * unbiased
        return y


def sync_batchnorm(momentum: float = 0.1, epsilon: float = 1e-5,
                   axis_name: str = "data",
                   name=None) -> nn.BatchNorm:
    """Cross-device synchronized BatchNorm — the reference's NaiveSyncBatchNorm
    (SlowFast/slowfast/models/batchnorm_helper.py NaiveSyncBatchNorm1d/3d:
    all-gather of per-GPU sums).  TPU-native: flax BatchNorm's axis_name
    lowers the stat reduction to a single psum over the mesh axis when the
    module runs inside shard_map/pmap over that axis; outside a mapped
    context use the plain factory (mspi_tpu.ops.layers.batchnorm).

    Matches the torch-converter conventions of ops.layers.batchnorm
    (momentum flip: torch momentum m == flax momentum 1-m)."""
    from mspi_tpu.ops.layers import default_compute_dtype

    return nn.BatchNorm(
        use_running_average=None, momentum=1.0 - momentum, epsilon=epsilon,
        axis_name=axis_name, name=name, dtype=default_compute_dtype(),
        scale_init=nn.initializers.ones, bias_init=nn.initializers.zeros)
