"""Multi-host (DCN) scaffolding: process init + per-host data feeding.

SURVEY.md §2.1 names multi-host as the rebuild's obligation beyond the
reference (which only ever ran single-process DataParallel): the SPMD
program is unchanged — the mesh just spans every host's devices, gradients
ride ICI within a host and DCN across hosts, and each host feeds only its
own shard of the global batch.

Usage on a v4-8 pod slice (one process per host):

    from cat_tpu.parallel import multihost
    multihost.initialize()                   # TPU pods: args auto-detected
    mesh = multihost.global_mesh()           # all devices on all hosts
    loader = create_dataloader(..., process_shard=multihost.process_shard())
    batch = multihost.shard_host_batch(local_batch, mesh)  # global array

CPU testing: pass coordinator/num_processes/process_id explicitly (see
tests/test_multihost.py, which runs a real 2-process jax.distributed
cluster).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cat_tpu.parallel.mesh import DATA_AXIS


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Tuple[int, ...]] = None,
) -> None:
    """jax.distributed.initialize with idempotence.

    On TPU pods all arguments are auto-detected from the environment; on
    CPU/GPU clusters pass them explicitly.  Safe to call when already
    initialized or when running single-process (num_processes == 1)."""
    if num_processes == 1:
        return
    if jax.distributed.is_initialized():
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise
    if jax.process_count() > 1:
        # startup barrier: a tiny all-device collective establishes the
        # cross-host communicator contexts NOW, while every process is at
        # the same point — context init inside the first (minutes-long)
        # train-step compile can exceed the transport's 30s key-exchange
        # timeout when hosts finish compiling at different times
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("cat_tpu:multihost_init")


def global_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over every device of every participating host."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_shard() -> Tuple[int, int]:
    """(process_index, process_count) for per-host dataset sharding."""
    return jax.process_index(), jax.process_count()


def shard_host_batch(local_batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Assemble a GLOBAL batch-sharded array from this host's local slice.

    Each host passes its own (global_batch / process_count)-sized arrays;
    the result is a jax.Array with global shape whose shards live on the
    local devices — no cross-host data movement."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if not isinstance(x, (np.ndarray, jax.Array)):
            return x
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(put, local_batch)


def local_mesh(axis: str = DATA_AXIS) -> Mesh:
    """1-D data mesh over THIS process's devices only.

    The evaluation sweep under multi-host (SURVEY §5.8) runs as independent
    per-host programs: each host takes its share of the val batches, shards
    them over its local chips, and the Fréchet / fast_hist reduction merges
    host-side (``reduce_moments`` / ``reduce_hist``) — no global-program
    lockstep, so hosts may process different batch counts."""
    return Mesh(np.asarray(jax.local_devices()), (axis,))


def localize(tree: Any) -> Any:
    """Fetch replicated global arrays to host numpy (fully-replicated
    arrays are addressable on every process).  Feed the result to
    parallel.mesh.replicate over ``local_mesh()`` for per-host eval."""
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


def reduce_moments(n: int, s1, s2):
    """Sum per-process activation moments (count, Σa, Σaaᵀ) across hosts.

    Every process MUST call this exactly once per evaluation (it is a
    cross-process collective).  Processes whose batch share was empty pass
    ``s1=s2=None``; the feature dim is agreed via a first allgather."""
    from jax.experimental import multihost_utils as mhu

    d_local = 0 if s1 is None else int(s1.shape[0])
    d = int(np.max(mhu.process_allgather(np.asarray(d_local, np.int64))))
    if s1 is None:
        s1 = np.zeros((d,), np.float64)
        s2 = np.zeros((d, d), np.float64)
    ns = mhu.process_allgather(np.asarray(n, np.int64))
    s1g = np.asarray(mhu.process_allgather(np.asarray(s1, np.float64))).sum(0)
    s2g = np.asarray(mhu.process_allgather(np.asarray(s2, np.float64))).sum(0)
    return int(ns.sum()), s1g, s2g


def reduce_hist(hist: np.ndarray) -> np.ndarray:
    """Sum per-process confusion matrices across hosts (additive like the
    Fréchet moments; reference fast_hist accumulation at
    metric/mIoU_score.py:209-247)."""
    from jax.experimental import multihost_utils as mhu

    return np.asarray(
        mhu.process_allgather(np.asarray(hist, np.int64))
    ).sum(axis=0)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate host-identical values over a multi-host mesh.

    Unlike a plain device_put(P()) — which would need cross-host transfers —
    every process supplies its own (identical, e.g. same-seed-initialized)
    copy and only feeds its local devices.  The caller must guarantee the
    values agree across hosts (same PRNG seeds / same checkpoint)."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(put, tree)
