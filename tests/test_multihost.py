"""Multi-host data parallelism: a real 2-process jax.distributed CPU
cluster (2 virtual devices per process, global mesh of 4) running per-host
data loading + a global collective + one KA-distill train step.

The idiomatic stand-in for a v4-8 multi-host run: same SPMD program, the
mesh just spans both processes (SURVEY.md §2.1)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    rng = np.random.RandomState(0)
    db = tmp_path / "db" / "train"
    os.makedirs(db)
    ims = []
    for i in range(8):
        arr = rng.randint(0, 255, size=(32, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(db / f"{i}.png")
        ims.append(arr)

    coordinator = f"localhost:{free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid),
             str(tmp_path / "db")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: two cold jax.distributed compiles share the host and
            # the suite may run beside other load on a 1-core box
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    means = [
        [ln for ln in out.splitlines() if ln.startswith("GLOBAL_MEAN")][0]
        for out in outs
    ]
    # both hosts computed the SAME global mean over the full global batch
    assert means[0] == means[1], means
    # and it matches the host-side mean of the first 4 (serial order) images'
    # A sides (aligned datasets split the 64-wide image into A|B halves)
    first4 = np.stack(ims[:4]).astype(np.float32)[:, :, :32, :]
    expected = (first4 / 255.0) * 2.0 - 1.0  # ToTensor + Normalize(0.5, 0.5)
    got = float(means[0].split()[1])
    assert abs(got - expected.mean()) < 1e-4, (got, expected.mean())

    steps = [
        [ln for ln in out.splitlines() if ln.startswith("STEP_OK")][0]
        for out in outs
    ]
    assert steps[0] == steps[1], steps  # identical loss on every host
