"""End-to-end A/B of the quantised frozen teacher on the flagship step.

VERDICT r4 #3 follow-through: tools/int8_probe.py showed XLA:TPU lowers
int8 convs to the double-rate MXU path (1.8x at the teacher's conv
geometry).  This tool measures what that buys END TO END: the full
horse2zebra KA-distill optimisation step (bench.py's exact build — teacher
ngf64, student shrunk to 2.6e9 MACs, 256px, batch 128, bf16 compute) with
the teacher forward in bf16 vs dynamic-range int8 (ops/quant.py).

Both variants are compiled at DEFAULT XLA effort (the tuned executables
the shipped bench reports), timed with the scalar-fetch sync that works
over the axon tunnel.  Reference counterpart: the teacher-under-no_grad
forward, /root/reference/distillers/inception_distiller.py:100-104 (the
reference has no quantised path; this is a TPU-native extension).

Usage: python tools/int8_e2e.py   (on the attached chip; ~15 min, mostly
two default-effort XLA compiles)
Prints one JSON line per variant; results recorded in PARITY.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CAT_TPU_HOST_INIT", "1")

import jax
import jax.numpy as jnp
import numpy as np

import bench

ITERS = int(os.environ.get("INT8_E2E_ITERS", "10"))
WARMUP = 3


def measure(teacher_dtype: str) -> float:
    os.environ["BENCH_TEACHER_DTYPE"] = teacher_dtype
    tag = teacher_dtype or "bf16"
    bench.log(f"[{tag}] building distiller")
    dist, state, teacher_vars, res = bench.build()
    gen = jax.jit(
        lambda k: {
            "A": jax.random.normal(k, (bench.BATCH, bench.SIZE, bench.SIZE, 3),
                                   jnp.float32),
            "B": jax.random.normal(jax.random.fold_in(k, 1),
                                   (bench.BATCH, bench.SIZE, bench.SIZE, 3),
                                   jnp.float32),
        }
    )
    batch = gen(np.array([0, 1], dtype=np.uint32))
    jax.block_until_ready(batch)
    if teacher_dtype == "int8_static":
        t0 = time.perf_counter()
        dist.calibrate_teacher(teacher_vars, batch["A"])
        bench.log(f"[{tag}] calibrated {len(dist._act_scales)} conv scales "
                  f"in {time.perf_counter() - t0:.1f}s")
    lr = jnp.asarray(2e-4, jnp.float32)
    t0 = time.perf_counter()
    step = jax.jit(dist._step, donate_argnums=(0,)).lower(
        state, teacher_vars, batch, lr).compile()
    bench.log(f"[{tag}] default-effort executable in "
              f"{time.perf_counter() - t0:.1f}s")
    state, metrics = step(state, teacher_vars, batch, lr)
    float(metrics["G_loss/recon"])  # full device sync (scalar fetch)
    for _ in range(WARMUP - 1):
        state, metrics = step(state, teacher_vars, batch, lr)
    float(metrics["G_loss/recon"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, teacher_vars, batch, lr)
    float(metrics["G_loss/recon"])
    dt = time.perf_counter() - t0
    ips = bench.BATCH * ITERS / dt
    print(json.dumps({
        "teacher_compute_dtype": tag,
        "images_per_sec": round(ips, 1),
        "ms_per_step": round(dt / ITERS * 1e3, 1),
        "recon_loss_last": float(metrics["G_loss/recon"]),
    }), flush=True)
    return ips


def main():
    # optional argv: subset of variants to run (e.g. `int8` alone to iterate
    # on the quantised path against an already-recorded bf16 number)
    variants = sys.argv[1:] or ["bf16", "int8", "int8_static"]
    results = {}
    for v in variants:
        results[v] = measure("" if v == "bf16" else v)
    if "bf16" in results:
        for v in ("int8", "int8_static"):
            if v in results:
                print(json.dumps({
                    f"{v}_vs_bf16_teacher_speedup":
                        round(results[v] / results["bf16"], 4),
                }), flush=True)


if __name__ == "__main__":
    main()
