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

Timing method: the op is CHAINED ``iters`` times inside ONE jitted
program via lax.fori_loop (carry = the activation, cast back to the
operand dtype each step) and the program returns a scalar mean, so one
``float(...)`` fetch is a full device sync.  Per-op ms = program time /
iters.  Anything async-dispatch based (block_until_ready on non-scalar
futures) reads hollow over the axon tunnel — the first version of this
probe measured 11,000 "TOPS" that way.

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
ITERS = int(os.environ.get("PROBE_ITERS", "50"))


def log(msg):
    print(f"[int8_probe +{time.perf_counter() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def conv_chain(dtype, acc):
    @jax.jit
    def f(x, k):
        xq = x.astype(dtype)
        kq = k.astype(dtype)

        def body(_, carry):
            y = jax.lax.conv_general_dilated(
                carry, kq, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            # scale down so float chains don't overflow to inf; int chains
            # wrap, which is fine for timing.  The cast keeps the carry in
            # the operand dtype so every iteration times the SAME op.
            if jnp.issubdtype(dtype, jnp.floating):
                y = y * jnp.asarray(1.0 / 48.0, acc)
            return y.astype(dtype)

        out = jax.lax.fori_loop(0, ITERS, body, xq)
        return out.astype(jnp.float32).mean()

    return f


def dot_chain(dtype, acc):
    @jax.jit
    def f(a, b):
        aq = a.astype(dtype)
        bq = b.astype(dtype)

        def body(_, carry):
            y = jax.lax.dot(carry, bq, preferred_element_type=acc)
            if jnp.issubdtype(dtype, jnp.floating):
                y = y * jnp.asarray(1e-2, acc)
            return y.astype(dtype)

        out = jax.lax.fori_loop(0, ITERS, body, aq)
        return out.astype(jnp.float32).mean()

    return f


@jax.jit
def _probe(x):
    return x.astype(jnp.float32).mean()


def timed_chain(f, *args):
    # compile + one run
    float(f(*args))
    t0 = time.perf_counter()
    float(f(*args))
    return (time.perf_counter() - t0) / ITERS


def main():
    # teacher feature-stage geometry: batch 64, 64x64 spatial, 256ch 3x3
    B, H, W, C = 64, 64, 64, 256
    macs_conv = B * H * W * C * C * 9
    gen = jax.jit(lambda key: (
        jax.random.normal(key, (B, H, W, C), jnp.float32),
        jax.random.normal(jax.random.fold_in(key, 1), (3, 3, C, C),
                          jnp.float32) * 0.01,
    ))
    log("dispatching operand gen")
    x, k = gen(np.array([0, 5], np.uint32))
    log("gen dispatched; syncing")
    float(_probe(x))  # jitted scalar sync — eager dispatches stall the tunnel
    log("conv operands resident")

    for name, dtype, acc in (
        ("conv_f32", jnp.float32, jnp.float32),
        ("conv_bf16", jnp.bfloat16, jnp.float32),
        ("conv_int8", jnp.int8, jnp.int32),
    ):
        try:
            dt = timed_chain(conv_chain(dtype, acc), x, k)
            tops = macs_conv * 2 / dt / 1e12
            print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                              "TOPS": round(tops, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": name, "error": repr(e)[:200]}),
                  flush=True)
        log(f"{name} done")

    # big matmul: the clean MXU-rate probe (8192^2 x 8192)
    M = 8192
    gen2 = jax.jit(lambda key: (
        jax.random.normal(key, (M, M), jnp.float32) * 0.01,
        jax.random.normal(jax.random.fold_in(key, 1), (M, M), jnp.float32)
        * 0.01,
    ))
    a, b = gen2(np.array([0, 6], np.uint32))
    float(_probe(a))
    log("matmul operands resident")
    for name, dtype, acc in (
        ("dot_bf16", jnp.bfloat16, jnp.float32),
        ("dot_int8", jnp.int8, jnp.int32),
    ):
        try:
            dt = timed_chain(dot_chain(dtype, acc), a, b)
            tops = 2 * M**3 / dt / 1e12
            print(json.dumps({"name": name, "ms": round(dt * 1e3, 3),
                              "TOPS": round(tops, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"name": name, "error": repr(e)[:200]}),
                  flush=True)
        log(f"{name} done")


if __name__ == "__main__":
    main()
