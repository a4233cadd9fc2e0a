"""Device mesh + sharding helpers.

The reference's only parallelism is single-process multi-GPU
``torch.nn.DataParallel`` (scatter/replicate/gather per call —
models/networks.py:157-161) plus a thread-rendezvous SyncBN.  The TPU-native
replacement is one SPMD program under GSPMD jit over a 1-D ``data`` mesh:

  * parameters and optimizer state are replicated,
  * batches are sharded on the leading axis,
  * gradient all-reduce, cross-replica batch-norm statistics, and loss
    means are all emitted by XLA as ICI collectives — there is no
    hand-written transport layer to maintain,
  * multi-host (DCN) is the same program over a larger mesh with per-host
    data feeding.

Growing beyond data parallelism (spatial sharding of feature maps with halo
exchange for very large resolutions) only needs extra axes in the mesh and
sharding rules here.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host batch with its leading dim sharded over the mesh."""
    sharding = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
