from mspi_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    param_shardings,
    replicated,
)
