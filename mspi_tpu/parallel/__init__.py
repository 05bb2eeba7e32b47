from mspi_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    maybe_init_distributed,
    param_shardings,
    replicated,
)
