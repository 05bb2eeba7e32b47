"""Classification heads for the video model zoo.

Reference: SlowFast/slowfast/models/head_helper.py:21-690 —
ResNetBasicHead (multi-pathway avg-pool + dropout + linear + softmax),
X3DHead (conv 1x1x1 lin5 pipeline) and TransformerBasicHead (cls/mean-pool +
linear).  Channels-last; eval-time activation is softmax over classes with
spatial averaging like the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import adaptive_avg_pool, batchnorm, conv3d, dense


class ResNetBasicHead(nn.Module):
    """Multi-pathway pool + concat + projection (head_helper.py:21-130)."""

    dim_in: Sequence[int]
    num_classes: int
    dropout_rate: float = 0.0

    def setup(self):
        self.projection = dense(sum(self.dim_in), self.num_classes)

    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False,
                 rng=None) -> jnp.ndarray:
        pools = [adaptive_avg_pool(x, 3) for x in inputs]
        x = jnp.concatenate(pools, axis=-1)  # [B,1,1,1,C]
        if self.dropout_rate > 0.0 and train and rng is not None:
            keep = 1.0 - self.dropout_rate
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        x = self.projection(x)
        if not train:
            x = jax.nn.softmax(x, axis=-1)
        return x.mean(axis=(1, 2, 3))


class X3DHead(nn.Module):
    """conv5 -> bn -> relu -> avgpool -> lin5 -> relu -> projection
    (head_helper.py X3DHead)."""

    dim_in: int
    dim_inner: int
    dim_out: int
    num_classes: int
    dropout_rate: float = 0.5
    bn_lin5_on: bool = False

    def setup(self):
        self.conv_5 = conv3d(self.dim_in, self.dim_inner, 1, 1, 0, bias=False)
        self.conv_5_bn = batchnorm()
        self.lin_5 = conv3d(self.dim_inner, self.dim_out, 1, 1, 0, bias=False)
        if self.bn_lin5_on:
            self.lin_5_bn = batchnorm()
        self.projection = dense(self.dim_out, self.num_classes)

    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False,
                 rng=None) -> jnp.ndarray:
        x = inputs[0]
        x = jax.nn.relu(self.conv_5_bn(self.conv_5(x), use_running_average=not train))
        x = adaptive_avg_pool(x, 3)
        x = self.lin_5(x)
        if self.bn_lin5_on:
            x = self.lin_5_bn(x, use_running_average=not train)
        x = jax.nn.relu(x)
        if self.dropout_rate > 0.0 and train and rng is not None:
            keep = 1.0 - self.dropout_rate
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        x = self.projection(x)
        if not train:
            x = jax.nn.softmax(x, axis=-1)
        return x.mean(axis=(1, 2, 3))


class TransformerBasicHead(nn.Module):
    """Mean-pool tokens + linear (head_helper.py TransformerBasicHead)."""

    dim_in: int
    num_classes: int
    dropout_rate: float = 0.5

    def setup(self):
        self.projection = dense(self.dim_in, self.num_classes)

    def __call__(self, x: jnp.ndarray, train: bool = False, rng=None) -> jnp.ndarray:
        if x.ndim > 3:  # [B,T,H,W,C] -> tokens
            x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = x.mean(axis=1)
        if self.dropout_rate > 0.0 and train and rng is not None:
            keep = 1.0 - self.dropout_rate
            x = jnp.where(jax.random.bernoulli(rng, keep, x.shape), x / keep, 0.0)
        x = self.projection(x)
        if not train:
            x = jax.nn.softmax(x, axis=-1)
        return x
