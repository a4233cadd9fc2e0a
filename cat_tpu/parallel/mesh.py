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

Beyond data parallelism, a second ``spatial`` mesh axis shards the image
HEIGHT dimension: convolutions under GSPMD get their halo exchanges
(boundary-row transfers between neighbouring shards) inserted by the XLA
SPMD partitioner automatically, and instance/batch-norm spatial reductions
become cross-device collectives the same way.  This is how resolutions
whose activations exceed one chip's HBM (>512px GauGAN) scale: no manual
``ppermute`` halo code to maintain — the partitioner owns it, we own the
sharding annotations (tests/test_sharding.py::test_spatial_sharding).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(n_devices: Optional[int] = None, axis: str = DATA_AXIS,
              n_spatial: int = 1) -> Mesh:
    """1-D data mesh, or a (data, spatial) 2-D mesh when n_spatial > 1."""
    devices = jax.devices()
    if n_devices is not None and n_devices > 0:
        total = n_devices * max(n_spatial, 1)
        if total > len(devices):
            raise ValueError(
                f"requested {total} devices but only {len(devices)} available"
            )
        devices = devices[:total]
    if n_spatial > 1:
        if len(devices) % n_spatial:
            raise ValueError(
                f"n_spatial={n_spatial} must divide the device count "
                f"({len(devices)}); pass --n_devices to use a subset"
            )
        grid = np.asarray(devices).reshape(len(devices) // n_spatial, n_spatial)
        return Mesh(grid, (axis, SPATIAL_AXIS))
    return Mesh(np.asarray(devices), (axis,))


def data_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    if SPATIAL_AXIS in mesh.axis_names:
        # NHWC: batch over data, height over spatial
        return NamedSharding(mesh, P(axis, SPATIAL_AXIS))
    return NamedSharding(mesh, P(axis))


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place a host batch with its leading dim sharded over the mesh (and,
    on a 2-D mesh, image height over the spatial axis)."""
    sharding = data_sharding(mesh, axis)
    batch_nd = NamedSharding(mesh, P(axis))  # for non-spatial entries

    def put(x):
        # only image-like entries (B, H, ...) of rank >= 3 get the spatial
        # axis — a (B, C) feature batch must not shard C over 'spatial'
        s = sharding if getattr(x, "ndim", 0) >= 3 else batch_nd
        return jax.device_put(x, s)

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_eval_array(x, mesh: Mesh, pad_to: int = 0, axis: str = DATA_AXIS):
    """Batch-shard an eval forward's input over the data axis.

    Eval sweeps have arbitrary tail sizes (drop_last=False), so the leading
    dim is padded — by edge-repeat — to ``pad_to`` (or to the next multiple
    of the data-axis size).  Returns ``(sharded_array, real_n)``; callers
    slice the forward's output back to ``real_n``.  SURVEY §5.8: judges run
    sharded, the Fréchet/fast_hist reduction stays host-side.
    """
    x = np.asarray(x)
    n_data = mesh.shape[axis]
    b = x.shape[0]
    target = max(pad_to, -(-b // n_data) * n_data)
    if target % n_data:
        target = -(-target // n_data) * n_data
    if target > b:
        x = np.concatenate([x, np.repeat(x[-1:], target - b, axis=0)], axis=0)
    return jax.device_put(x, NamedSharding(mesh, P(axis))), b
