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
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 emulated devices time-share this image's single core: a collective can
# legitimately wait minutes for its peers' thunks to be scheduled, and
# XLA:CPU hard-aborts the process after 40 s by default.  Must be set here
# (before the backend initialises) — __graft_entry__ sets it too, but that
# is a no-op once earlier tests have already initialised the CPU client.
if "collective_call_terminate_timeout" not in flags:
    flags += " --xla_cpu_collective_call_terminate_timeout_seconds=3000"
os.environ["XLA_FLAGS"] = flags

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
