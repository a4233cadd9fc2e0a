"""Worker for tests/test_multihost.py: one process of a 2-process
jax.distributed CPU cluster.

Each process owns 2 virtual CPU devices (global mesh = 4), loads its own
half of every global batch via DataLoader(process_shard=...), assembles the
global array with shard_host_batch, and runs (a) a jitted global mean and
(b) one KA-distill train step over the global mesh — proving the SPMD
program runs unchanged multi-host.

Invoked: python multihost_worker.py <coordinator> <num_procs> <pid> <dataroot>
"""

import os
import sys

coordinator, num_procs, pid, dataroot = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from cat_tpu.parallel import multihost  # noqa: E402

multihost.initialize(coordinator_address=coordinator, num_processes=num_procs,
                     process_id=pid)
assert jax.process_count() == num_procs, jax.process_count()
mesh = multihost.global_mesh()
assert len(mesh.devices.ravel()) == 2 * num_procs

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cat_tpu.data.datasets import create_dataloader  # noqa: E402
from cat_tpu.data.transforms import TransformSpec  # noqa: E402

GLOBAL_BATCH = 4
spec = TransformSpec(preprocess="none", no_flip=True)
loader = create_dataloader(
    "aligned", dataroot, GLOBAL_BATCH, spec, phase="train",
    serial_batches=True, seed=0, num_workers=2,
)
loader.process_shard = multihost.process_shard()
batches = [b for b in loader]
local = batches[0]["A"]
assert local.shape[0] == GLOBAL_BATCH // num_procs, local.shape

gbatch = multihost.shard_host_batch(
    {"A": batches[0]["A"], "B": batches[0]["B"]}, mesh
)
assert gbatch["A"].shape[0] == GLOBAL_BATCH  # global view

mean = jax.jit(lambda x: jnp.mean(x))(gbatch["A"])
print(f"GLOBAL_MEAN {float(mean):.6f}", flush=True)

# one real KA-distill train step over the multi-host mesh
from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig  # noqa: E402
from cat_tpu.distill.inception_distiller import (  # noqa: E402
    DistillHParams, InceptionDistiller,
)

norm = NormConfig(kind="syncbatch", affine=True, track_running_stats=True)


def small(ngf):
    return InceptionGeneratorConfig.make(
        ngf=ngf, channels=None, channels_reduction_factor=2,
        kernel_sizes=(1, 3), n_blocks=2, norm=norm,
    )


hp = DistillHParams(dataset_mode="aligned", gan_mode="lsgan",
                    distill_loss_type="ka", lambda_recon=5.0,
                    mapping_layers=("encode",))
dist = InceptionDistiller(small(8), small(4), hp=hp)
size = local.shape[1]
teacher_vars = dist.netG_teacher.init(
    jax.random.PRNGKey(7), jnp.zeros((1, size, size, 3))
)
state, teacher_vars = dist.init_state(jax.random.PRNGKey(0), size, size,
                                      teacher_vars)
# same seeds on every host -> identical values; multihost.replicate feeds
# local devices only (no cross-host transfers)
state = multihost.replicate(state, mesh)
teacher_vars = multihost.replicate(teacher_vars, mesh)
state, metrics = dist.train_step(state, teacher_vars, gbatch, 2e-4)
jax.block_until_ready(metrics)
vals = {k: float(v) for k, v in metrics.items()}
assert all(np.isfinite(v) for v in vals.values()), vals
print(f"STEP_OK {vals['G_loss/recon']:.6f}", flush=True)
