import os


def pallas_enabled() -> bool:
    """Use Pallas kernels on TPU unless explicitly disabled.
    MSPI_PALLAS_INTERPRET=1 forces them ON anywhere, in interpret mode —
    lets CPU tests drive the real integration path (gating, augmentation,
    custom_vjp) end to end."""
    if os.environ.get("MSPI_DISABLE_PALLAS"):
        return False
    if os.environ.get("MSPI_PALLAS_INTERPRET"):
        return True
    import jax

    return jax.default_backend() in ("tpu", "axon")


def pallas_interpret() -> bool:
    return bool(os.environ.get("MSPI_PALLAS_INTERPRET"))
