"""Device mesh + sharding rules.

The reference's distribution layer is torch.distributed/NCCL process groups
with DDP gradient all-reduce (SlowFast/slowfast/utils/{distributed,
multiprocessing}.py).  TPU-native, the same capability is one jitted program
over a jax.sharding.Mesh:

- **DP**: batch axis sharded over the 'data' mesh axis; XLA inserts the
  gradient psum (the DDP all-reduce) automatically from the sharding specs.
- **TP**: the fusion transformer's attention/MLP weights are sharded over
  the 'model' axis Megatron-style (qkv/fc1 column-split, proj/fc2
  row-split); XLA inserts the activation all-reduces over ICI.

No init_process_group / spawn plumbing exists or is needed; collectives ride
ICI by construction of the mesh.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    mesh_shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """(data, model) mesh. Default: all devices on 'data' (pure DP)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    assert mesh_shape[0] * mesh_shape[1] == n, (mesh_shape, n)
    arr = np.array(devices).reshape(mesh_shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, data_axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style TP rules for the fusion transformer + SimSiam heads:
# column-parallel (shard output features) for qkv/fc1/first projector linears,
# row-parallel (shard input features) for proj/fc2.  Only 2-D kernels on the
# sync block / projector paths participate; conv towers stay replicated
# (they are small relative to ICI bandwidth at this model scale).
_COL_RE = re.compile(
    r"(aud_vis_sync_block/.*/(qkv|fc1)/kernel$)"
)
_ROW_RE = re.compile(
    r"(aud_vis_sync_block/.*/(proj|fc2)/kernel$)"
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_shardings(mesh: Mesh, variables: Any, model_axis: str = "model") -> Any:
    """NamedSharding tree for a variables pytree: TP on the sync-block
    attention/MLP kernels, replicated elsewhere."""

    def rule(path, leaf):
        p = _path_str(path)
        if mesh.shape[model_axis] > 1:
            if _COL_RE.search(p):
                return NamedSharding(mesh, P(None, model_axis))
            if _ROW_RE.search(p):
                return NamedSharding(mesh, P(model_axis, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)


def maybe_init_distributed() -> bool:
    """Multi-host (DCN) initialisation — the TPU-native analog of the
    reference's NUM_SHARDS multi-machine path
    (SlowFast/slowfast/utils/multiprocessing.py:9-60 spawns one process
    per GPU and init_process_group's over TCP).  Here: one process per
    host, `jax.distributed.initialize` over the coordinator, and the same
    single jitted program — `jax.devices()` then spans all hosts, so every
    mesh built by create_mesh is global with zero further plumbing.

    No-op (returns False) unless MSPI_COORDINATOR is set;
    MSPI_NUM_PROCESSES / MSPI_PROCESS_ID complete the spec."""
    import os

    addr = os.environ.get("MSPI_COORDINATOR")
    if not addr:
        return False
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(os.environ["MSPI_NUM_PROCESSES"]),
        process_id=int(os.environ["MSPI_PROCESS_ID"]))
    return True
