"""Test harness: force JAX onto a virtual 8-device CPU platform so sharding
tests run anywhere (the standard trick the reference's NCCL test gap calls
for — SURVEY.md §4).

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are too late — we must
go through jax.config.update before any backend is initialised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the big fusion-model jits dominate test time;
# cache them across runs.
os.makedirs("/tmp/mspi_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/mspi_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(2023)
