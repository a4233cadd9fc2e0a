"""Worker for tests/test_multihost.py::test_sharded_eval_two_process — one
process of a 2-process jax.distributed CPU cluster validating the
multi-host eval sharding (SURVEY §5.8): each process sweeps its round-robin
share of the val batches on its LOCAL device mesh and the Fréchet moments
merge across hosts (parallel.multihost.reduce_moments) — the result must
EXACTLY match the full single-process sweep.

Invoked: python multihost_eval_worker.py <coordinator> <nprocs> <pid>
"""

import os
import sys

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cat_tpu.parallel import multihost  # noqa: E402
from cat_tpu.train.evaluation import FIDEvaluator  # noqa: E402

multihost.initialize(coordinator_address=coordinator,
                     num_processes=num_procs, process_id=pid)
assert jax.process_count() == num_procs

SIZE = 8
D = 6


class LinearJudge:
    """Stand-in InceptionV3: returns [flattened @ w] as the feature list
    (same shape contract as tests/test_sharding.py's _LinearJudge)."""

    def apply(self, variables, x01):
        w = variables["w"]
        return [jnp.reshape(jnp.asarray(x01, jnp.float32),
                            (x01.shape[0], -1)) @ w]


rng = np.random.RandomState(7)
judge = LinearJudge()
jvars = {"w": jnp.asarray(rng.randn(SIZE * SIZE * 3, D), jnp.float32)}
a = rng.randn(D, D)
stats = {"mu": rng.randn(D), "sigma": a @ a.T + np.eye(D)}

generate = jax.jit(lambda x: jnp.tanh(-jnp.asarray(x, jnp.float32)))


def loader():
    r = np.random.RandomState(0)
    # 5 batches with a ragged tail: with 2 processes the round-robin split
    # is uneven (3 vs 2 batches) on purpose
    return [{"A": r.randn(n, SIZE, SIZE, 3).astype(np.float32)}
            for n in (4, 4, 4, 4, 3)]


# full single-process sweep (ground truth — identical on every process)
ev_full = FIDEvaluator(generate, loader(), judge, jvars, stats,
                       log_dir=None, eval_batch_size=4)
fid_full = ev_full(0)[0]["metric/fid"]

# multi-host sharded sweep: local mesh + round-robin batches + moment merge
ev_mh = FIDEvaluator(generate, loader(), judge, jvars, stats,
                     log_dir=None, eval_batch_size=4,
                     mesh=multihost.local_mesh(),
                     process_shard=multihost.process_shard())
fid_mh = ev_mh(0)[0]["metric/fid"]

# confusion-matrix merge (mIoU counterpart): per-process hists sum
hist = np.full((3, 3), pid + 1, np.int64)
merged = multihost.reduce_hist(hist)
assert merged.sum() == 9 * sum(range(1, num_procs + 1)), merged

print(f"FID_FULL {fid_full:.10f}", flush=True)
print(f"FID_MH {fid_mh:.10f}", flush=True)
print(f"EVAL_OK pid={pid}", flush=True)
