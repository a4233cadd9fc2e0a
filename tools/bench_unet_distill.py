"""Stretch-family bench: GenericDistiller over the diffusion-style UNet.

One on-chip throughput number proving the KA harness generalises beyond the
reference's inception GANs (BASELINE.md stretch goal): teacher UNet
(base 64, mults 1/2/4) -> student (base 32), KA taps at down1/mid/up1,
recon-to-teacher, Adam — the full GenericDistiller train step at 256px.

Follows bench.py's axon-tunnel rules: CAT_TPU_HOST_INIT=1 (zero-XLA init),
synthetic batch generated on-device by one jit, block_until_ready syncs.

Prints one JSON line: {"metric", "value", "unit"}.
"""

import json
import os
import sys
import time

os.environ.setdefault("CAT_TPU_HOST_INIT", "1")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

SIZE = int(os.environ.get("BENCH_SIZE", "256"))
BATCH = int(os.environ.get("BENCH_BATCH", "32"))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
WARMUP = 3
ITERS = 10

_T0 = time.perf_counter()


def log(msg: str) -> None:
    print(f"[unet-bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from cat_tpu.distill.generic import GenericDistillHParams, GenericDistiller
    from cat_tpu.models.unet import UNet, UNetConfig
    from cat_tpu.train.common import init_on_cpu

    t_cfg = UNetConfig(base=64, mults=(1, 2, 4), res_blocks=2)
    s_cfg = UNetConfig(base=32, mults=(1, 2, 4), res_blocks=2)
    taps = ("down1", "mid", "up1")
    hp = GenericDistillHParams(distill_loss_type="ka", recon_loss_type="l2",
                               lambda_recon=1.0, lambda_distill=1.0,
                               mapping_layers=taps, compute_dtype=DTYPE)
    teacher, student = UNet(t_cfg), UNet(s_cfg)
    dist = GenericDistiller(teacher, student, t_cfg.tap_widths,
                            s_cfg.tap_widths, hp)

    log(f"building (batch {BATCH}, {SIZE}px); backend={jax.default_backend()}")
    rng = np.array([0, 233], dtype=np.uint32)
    example = (jnp.zeros((1, SIZE, SIZE, 3)),)
    teacher_vars = init_on_cpu(lambda: teacher.init(rng, *example))
    state, teacher_vars = dist.init_state(
        np.array([0, 7], dtype=np.uint32), example, teacher_vars)
    log("state initialised; generating batch on device")

    gen = jax.jit(lambda k: jax.random.normal(
        k, (BATCH, SIZE, SIZE, 3), jnp.float32))
    x = gen(np.array([0, 1], dtype=np.uint32))
    jax.block_until_ready(x)
    log("batch resident; compiling train step")

    t0 = time.perf_counter()
    state, metrics = dist.train_step(state, teacher_vars, (x,), 1e-4)
    float(metrics["G_loss/recon"])  # full device sync (block_until_ready is
    # unreliable over the axon tunnel for non-scalar futures)
    log(f"first step done (compile+run {time.perf_counter() - t0:.1f}s)")
    for _ in range(WARMUP - 1):
        state, metrics = dist.train_step(state, teacher_vars, (x,), 1e-4)
    float(metrics["G_loss/recon"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = dist.train_step(state, teacher_vars, (x,), 1e-4)
    float(metrics["G_loss/recon"])
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": (f"UNet KA-distill step throughput (teacher base64 -> "
                   f"student base32, {SIZE}px, batch {BATCH}, {DTYPE})"),
        "value": round(ips, 3),
        "unit": "images/sec/chip",
    }), flush=True)
    log(f"{ips:.1f} img/s; losses recon={float(metrics['G_loss/recon']):.4f} "
        f"distill={float(metrics['G_loss/distill']):.4f}")


if __name__ == "__main__":
    main()
