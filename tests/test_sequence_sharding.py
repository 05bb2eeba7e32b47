"""Sequence sharding of the per-frame image-prior encoder: the (b*t) frame
axis of the ConvNeXt trunk distributed over the whole mesh (the SURVEY §5
'shard the (b t) ConvNeXt frame axis across ICI' demonstration).

Sharded execution must match the single-device result exactly (the op is
frame-wise; XLA partitions it without cross-device communication)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mspi_tpu.models.convnext import ConvNeXtTinyFeatures
from mspi_tpu.parallel import create_mesh


def test_frame_axis_sequence_sharding(rng):
    assert len(jax.devices()) == 8
    mesh = create_mesh((4, 2))

    model = ConvNeXtTinyFeatures()
    frames = rng.standard_normal((16, 64, 96, 3)).astype(np.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.asarray(frames[:1]))

    ref = jax.jit(lambda v, f: model.apply(v, f)[-1])(variables,
                                                      jnp.asarray(frames))

    # shard the frame axis over BOTH mesh axes (8-way sequence sharding)
    fs = jax.device_put(jnp.asarray(frames),
                        NamedSharding(mesh, P(("data", "model"), None, None, None)))
    vs = jax.device_put(variables, NamedSharding(mesh, P()))
    out = jax.jit(lambda v, f: model.apply(v, f)[-1])(vs, fs)

    np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5,
                               rtol=1e-5)
    # the output really is sharded over the frame axis
    assert len(out.sharding.device_set) == 8


def test_maybe_init_distributed_noop(monkeypatch):
    from mspi_tpu.parallel import maybe_init_distributed

    monkeypatch.delenv("MSPI_COORDINATOR", raising=False)
    assert maybe_init_distributed() is False
