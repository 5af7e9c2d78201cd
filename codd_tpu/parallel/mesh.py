"""Device mesh + sharding helpers.

The reference scales with NCCL DDP (one process per GPU, gradient
allreduce — reference: apis/train.py:40-50, configs/default_runtime.py:11).
The TPU-native equivalent is a 1-D ``data`` mesh with batch-sharded inputs
and replicated params: jit inserts the gradient psum automatically, and the
collectives ride ICI.  Multi-host setups call ``jax.distributed.initialize``
once at program start and use the same code path (single-controller SPMD).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "data_sharding"]


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence[Any]] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding for input pytrees."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array of the batch with its leading axis split over
    the data mesh (the per-host analogue of the reference's rank-sharded
    dataset: inference.py:101-103).

    Single-process: a plain device_put.  Multi-process (multi-host SPMD):
    each host passes its LOCAL shard of the batch and the global array is
    assembled across hosts (``make_array_from_process_local_data``) — the
    moral equivalent of DDP's per-rank dataloader shard."""
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
