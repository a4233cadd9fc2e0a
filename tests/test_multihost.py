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


EVAL_WORKER = os.path.join(os.path.dirname(__file__), "multihost_eval_worker.py")


def test_sharded_eval_two_process():
    """Multi-host eval sharding (SURVEY §5.8): each process sweeps its
    round-robin share of the val batches on its LOCAL mesh and the Fréchet
    moments merge across hosts — the FID must EXACTLY match the full
    single-process sweep (additive moments == np.cov over the concat)."""
    coordinator = f"localhost:{free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, EVAL_WORKER, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"EVAL_OK pid={pid}" in out

    def grab(out, key):
        return float([ln for ln in out.splitlines()
                      if ln.startswith(key)][0].split()[1])

    for out in outs:
        full, mh = grab(out, "FID_FULL"), grab(out, "FID_MH")
        assert np.isfinite(full)
        # moment-merge identity: same value as the monolithic sweep
        assert abs(mh - full) <= 1e-6 * max(abs(full), 1.0), (mh, full)
    # and both processes agree bit-for-bit on the merged value
    assert grab(outs[0], "FID_MH") == grab(outs[1], "FID_MH")


TRAIN_WORKER = os.path.join(os.path.dirname(__file__), "multihost_train_worker.py")


def test_train_py_two_process(tmp_path):
    """The ACTUAL train.py verb over a 2-process cluster: --multihost wires
    jax.distributed init, the global mesh, per-host data slices of the
    GLOBAL --batch_size, and process-0-only log/checkpoint writes — the
    driver-level multi-host contract (SURVEY §2.1; reference analogue is
    the DataParallel wiring its drivers invoke, models/networks.py:157-161).
    """
    rng = np.random.RandomState(0)
    root = tmp_path / "db"
    for sub, n in (("train", 8), ("val", 2)):
        os.makedirs(root / sub)
        for i in range(n):
            arr = rng.randint(0, 255, size=(16, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(root / sub / f"{i}.png")
    log_dir = tmp_path / "logs"

    coordinator = f"localhost:{free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, TRAIN_WORKER, coordinator, "2", str(pid),
             str(root), str(log_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"TRAIN_DONE pid={pid}" in out

    # ONE coherent checkpoint set, written by process 0 alone
    ckpt_path = log_dir / "checkpoints" / "1_net_G.msgpack"
    assert ckpt_path.exists(), os.listdir(log_dir / "checkpoints")
    from cat_tpu.core.config import config_from_json
    from cat_tpu.utils.checkpoint import load_pytree

    variables = load_pytree(str(ckpt_path))
    leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(variables)]
    assert leaves and all(np.isfinite(v).all() for v in leaves)
    with open(str(ckpt_path).replace(".msgpack", ".json")) as f:
        cfg = config_from_json(f.read())
    assert cfg.ds_channels[0] == 4 and len(cfg.blocks) == 1  # ngf 4, 1 block

    # log.txt / opt.txt written exactly once (no second-process interleave)
    opt_txt = (log_dir / "opt.txt").read_text()
    assert opt_txt.count("----------------- End") == 1, opt_txt
    assert (log_dir / "log.txt").exists()


def test_train_py_two_process_with_miou_eval(tmp_path):
    """train.py over 2 processes WITH a live evaluation sweep: the tiny DRN
    mIoU judge runs process-sharded on local meshes from a localized copy
    of the generator state (entry._eval_state_fn), and the confusion
    matrices merge across hosts — eval is sharded, not redundant (SURVEY
    §5.8; VERDICT r4 missing #2)."""
    import jax as _jax
    import jax.numpy as jnp
    from PIL import Image as PILImage

    from cat_tpu.metrics.drn import DRNSeg, save_drnseg

    H, W, CLASSES = 16, 32, 3
    model = DRNSeg(classes=CLASSES, layers=(1, 1, 1, 1, 1, 1, 1, 1),
                   channels=(4, 8, 8, 8, 8, 8, 8, 8))
    variables = model.init(_jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))
    drn_path = save_drnseg(str(tmp_path / "drn_tiny.msgpack"), model, variables)

    rng = np.random.RandomState(0)
    root = tmp_path / "db_cityscapes"
    labels_root = tmp_path / "cs"
    (labels_root / "gtFine" / "val" / "synth").mkdir(parents=True)
    rows = []
    for sub, n in (("train", 8), ("val", 4)):
        os.makedirs(root / sub)
        for i in range(n):
            stem = f"synth_{i:06d}_000019"
            arr = rng.randint(0, 255, size=(H, 2 * W, 3), dtype=np.uint8)
            PILImage.fromarray(arr).save(root / sub / f"{stem}_leftImg8bit.png")
            if sub == "val":
                lab = rng.randint(0, CLASSES, (H, W)).astype(np.uint8)
                PILImage.fromarray(lab).save(
                    labels_root / "gtFine" / "val" / "synth" /
                    f"{stem}_gtFine_labelIds.png")
                rows.append(f"{i} gtFine/val/synth/{stem}_gtFine_labelIds.png "
                            f"leftImg8bit/val/synth/{stem}_leftImg8bit.png")
    table = tmp_path / "table.txt"
    table.write_text("\n".join(rows) + "\n")
    log_dir = tmp_path / "logs"

    coordinator = f"localhost:{free_port()}"
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    procs = [
        subprocess.Popen(
            [sys.executable, TRAIN_WORKER, coordinator, "2", str(pid),
             str(root), str(log_dir), drn_path, str(table), str(labels_root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"TRAIN_DONE pid={pid}" in out

    # the mIoU metric reached the (process-0-only) log — the sharded eval
    # actually ran and merged
    log = (log_dir / "log.txt").read_text()
    assert "mIoU" in log, log
