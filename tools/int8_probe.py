"""Does XLA:TPU run int8 convolutions at the MXU's double-rate path?

VERDICT r4 next-step #3: the frozen teacher is 48% of the inception
distill step and is inference-only; the v5e MXU doubles peak at int8.
Before integrating a quantized-teacher path through every conv in the
generator, measure the PRIMITIVE: time bf16 vs int8 `lax.conv` and
`lax.dot` at teacher-like shapes (256px, 256-channel 3x3 convs — the
teacher's feature-stage geometry, models/blocks.py).  If XLA upcasts
int8 convs instead of hitting the int8 systolic path, the whole lever is
dead on this compiler and the negative result gets documented in
PARITY.md with these numbers.

Usage: python tools/int8_probe.py  (on the attached TPU chip)
Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

os.environ.setdefault("CAT_TPU_HOST_INIT", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import cat_tpu  # noqa: F401  (persistent compile cache)

_T0 = time.perf_counter()


def log(msg):
    print(f"[int8_probe +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def timed(fn, *args, iters=20, warmup=3):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup - 1):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_fn(dtype, acc):
    @jax.jit
    def f(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(dtype), k.astype(dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc,
        )
    return f


def dot_fn(dtype, acc):
    @jax.jit
    def f(a, b):
        return jax.lax.dot(a.astype(dtype), b.astype(dtype),
                           preferred_element_type=acc)
    return f


def main():
    # teacher feature-stage geometry: batch 64, 64x64 spatial, 256ch 3x3
    B, H, W, C = 64, 64, 64, 256
    macs_conv = B * H * W * C * C * 9
    gen = jax.jit(lambda key: (
        jax.random.normal(key, (B, H, W, C), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                          jnp.float32),
    ))
    x, k = gen(np.array([0, 5], np.uint32))
    jax.block_until_ready((x, k))
    log("conv operands resident")

    for name, dtype, acc in (
        ("conv_f32", jnp.float32, jnp.float32),
        ("conv_bf16", jnp.bfloat16, jnp.float32),
        ("conv_int8", jnp.int8, jnp.int32),
    ):
        try:
            dt = timed(conv_fn(dtype, acc), x, k)
            tops = macs_conv * 2 / dt / 1e12
            print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                              "TOPS": round(tops, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": name, "error": repr(e)[:200]}),
                  flush=True)

    # big matmul: the clean MXU-rate probe (8192^2 x 8192)
    M = 8192
    gen2 = jax.jit(lambda key: (
        jax.random.normal(key, (M, M), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1), (M, M), jnp.float32),
    ))
    a, b = gen2(np.array([0, 6], np.uint32))
    jax.block_until_ready((a, b))
    log("matmul operands resident")
    for name, dtype, acc in (
        ("dot_bf16", jnp.bfloat16, jnp.float32),
        ("dot_int8", jnp.int8, jnp.int32),
    ):
        try:
            dt = timed(dot_fn(dtype, acc), a, b, iters=10)
            tops = 2 * M**3 / dt / 1e12
            print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                              "TOPS": round(tops, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": name, "error": repr(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
