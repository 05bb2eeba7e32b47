import os


def pallas_enabled() -> bool:
    """Use Pallas kernels on TPU unless explicitly disabled."""
    if os.environ.get("MSPI_DISABLE_PALLAS"):
        return False
    import jax

    return jax.default_backend() in ("tpu", "axon")
