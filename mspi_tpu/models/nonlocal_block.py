"""Non-local block.

Reference: /root/reference/SlowFast/nonlocal_helper.py:10-144 — theta/phi/g
1x1x1 convs, einsum affinity (softmax or dot-product normalisation),
optional spatio-temporal pooling of phi/g, final conv + zero-init BN
residual.  Pluggable into ResStage via nonlocal_inds (the MSPI configs ship
it disabled; the capability is here for the zoo).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mspi_tpu.ops import batchnorm, conv3d, max_pool


class Nonlocal(nn.Module):
    dim: int
    dim_inner: int
    pool_size: Optional[Tuple[int, int, int]] = None
    instantiation: str = "softmax"

    def setup(self):
        self.conv_theta = conv3d(self.dim, self.dim_inner, 1)
        self.conv_phi = conv3d(self.dim, self.dim_inner, 1)
        self.conv_g = conv3d(self.dim, self.dim_inner, 1)
        self.conv_out = conv3d(self.dim_inner, self.dim, 1)
        self.bn = batchnorm()
        self.use_pool = self.pool_size is not None and any(s > 1 for s in self.pool_size)

    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        B, T, H, W, C = x.shape
        theta = self.conv_theta(x).reshape(B, -1, self.dim_inner)
        if self.use_pool:
            x = max_pool(x, self.pool_size, self.pool_size, 0)
        phi = self.conv_phi(x).reshape(B, -1, self.dim_inner)
        g = self.conv_g(x).reshape(B, -1, self.dim_inner)

        affinity = jnp.einsum("btc,bpc->btp", theta, phi)
        if self.instantiation == "softmax":
            affinity = jax.nn.softmax(affinity * (self.dim_inner ** -0.5), axis=2)
        elif self.instantiation == "dot_product":
            affinity = affinity / affinity.shape[2]
        else:
            raise NotImplementedError(self.instantiation)

        out = jnp.einsum("btg,bgc->btc", affinity, g).reshape(B, T, H, W, self.dim_inner)
        out = self.bn(self.conv_out(out), use_running_average=not train)
        return identity + out
