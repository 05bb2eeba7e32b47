"""Persistent XLA compilation cache setup.

Compiles for the tunneled TPU are expensive (remote compile service);
caching them across processes makes reruns of bench/train/inference cheap.
"""

import os


def enable_compilation_cache(path: str = "/tmp/mspi_jax_cache"):
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
