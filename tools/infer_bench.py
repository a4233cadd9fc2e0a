"""Deployment inference benchmark: compressed student vs its teacher.

The reference's whole purpose is compressing conditional GANs so they can
be SERVED cheaply (reference README.md:1-20 "efficient image synthesis";
its profiler measures batch-1 forward latency via TestOptions ``--times``,
test_options.py:108-111, profiler.py:139-149).  This tool measures that
deployment payoff directly on the attached chip: eval-mode generator
forwards only — no discriminator, no losses — bf16 compute, packed blocks,
reporting batch-1 latency and a batched-throughput sweep for the teacher
and the shrunk student of both flagship families:

  inception  horse2zebra recipe at 256px — teacher ngf 64 vs student
             shrunk on-chip to the shipped 2.6e9-MAC budget
             (scripts/cycle_gan/horse2zebra/train_inception_student_2p6B.sh)
  spade      gaugan cityscapes 5p6B recipe at 512x256, ups=more — teacher
             ngf 64 vs student shrunk to 5.6e9 MACs
             (scripts/gaugan/cityscapes/train_inception_student_5p6B.sh:17,24)

Weights are random (throughput depends on shapes/dtypes only).  Inputs are
generated on-device by a tiny jitted program — a host device_put of a big
batch costs minutes through the axon tunnel (see bench.py).

Usage:
  python tools/infer_bench.py                      # both families
  python tools/infer_bench.py --family inception
  python tools/infer_bench.py --family spade
  python tools/infer_bench.py --batches 1,8,64     # override the sweep

One JSON line per measurement, then a summary line per family with the
student:teacher ratios (b1 latency and best-batch throughput).
"""

import argparse
import importlib.util
import json
import os
import sys
import time

os.environ.setdefault("CAT_TPU_HOST_INIT", "1")  # zero-XLA numpy init

import jax
import jax.numpy as jnp
import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_TOOLS)
sys.path.insert(0, _ROOT)

_T0 = time.perf_counter()


def log(msg):
    print(f"[infer_bench +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


@jax.jit
def _scalar_probe(tree):
    leaves = [jnp.sum(x.astype(jnp.float32))
              for x in jax.tree_util.tree_leaves(tree)]
    return sum(leaves[:1])


def timed(fn, name, imgs, iters=10, warmup=2):
    """Time ``fn()`` with the scalar-fetch sync (block_until_ready is
    unreliable over the axon tunnel for non-scalar futures — bench.py)."""
    for _ in range(warmup):
        out = fn()
    float(_scalar_probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    float(_scalar_probe(out))
    dt = (time.perf_counter() - t0) / iters
    line = {"name": name, "ms": round(dt * 1e3, 3),
            "img_per_s": round(imgs / dt, 3)}
    print(json.dumps(line), flush=True)
    return dt


def _load_module(fname):
    spec = importlib.util.spec_from_file_location(
        fname.rsplit("/", 1)[-1][:-3], fname)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sweep(fwd_t, fwd_s, make_x, batches, family, iters, extra=()):
    """Time teacher + student (+ extra (tag, fwd) rows, e.g. the exported
    StableHLO artifact) at each batch; return summary dict."""
    rows = {}
    for b in batches:
        x = make_x(b)
        jax.block_until_ready(x)
        for tag, fwd in (("teacher", fwd_t), ("student", fwd_s), *extra):
            n = max(iters, 20) if b == 1 else iters
            dt = timed(lambda fwd=fwd, x=x: fwd(x),
                       f"infer/{family}_{tag} b{b}", imgs=b, iters=n)
            rows[(tag, b)] = dt
    # b1 columns only when batch 1 was actually swept (--batches overrides
    # like "8,64" are allowed; emit nulls rather than KeyError after the
    # whole sweep already ran)
    t_b1 = rows.get(("teacher", 1))
    s_b1 = rows.get(("student", 1))
    bmax = max(batches)
    t_thru = bmax / rows[("teacher", bmax)]
    s_thru = bmax / rows[("student", bmax)]
    summary = {
        "name": f"infer/{family} summary",
        "teacher_b1_ms": round(t_b1 * 1e3, 3) if t_b1 else None,
        "student_b1_ms": round(s_b1 * 1e3, 3) if s_b1 else None,
        "b1_latency_speedup": round(t_b1 / s_b1, 2) if t_b1 and s_b1 else None,
        "teacher_img_per_s": round(t_thru, 1),
        "student_img_per_s": round(s_thru, 1),
        "throughput_speedup": round(s_thru / t_thru, 2),
        "batch": bmax,
    }
    a_b1 = rows.get(("artifact", 1))
    if a_b1 is not None:
        # the deployment contract is the EXPORTED StableHLO student, not
        # the in-framework jit — prove the artifact hits the same numbers
        # (reference ships the ONNX export, onnx_exporter.py:134-163)
        summary["artifact_b1_ms"] = round(a_b1 * 1e3, 3)
    if ("artifact", bmax) in rows:
        summary["artifact_img_per_s"] = round(bmax / rows[("artifact", bmax)], 1)
    print(json.dumps(summary), flush=True)
    return summary


def _artifact_forward(student_cfg, variables, h, w, family):
    """Round-trip the student through the shipped StableHLO export and
    return a timed forward over the deserialized artifact."""
    import jax.numpy as jnp

    from cat_tpu.export import export_stablehlo, load_stablehlo

    path = os.path.join("/tmp", f"infer_bench_{family}_student.stablehlo")
    export_stablehlo(student_cfg, variables, h, w, path)
    exported = load_stablehlo(path)

    @jax.jit
    def fwd(x):
        # the artifact's signature is float32 (the export contract)
        return exported.call(jnp.asarray(x, jnp.float32))

    return fwd


def run_inception(batches, iters):
    """horse2zebra: teacher ngf64 vs student @2.6e9 MACs, 256px, bf16."""
    bench = _load_module(os.path.join(_ROOT, "bench.py"))
    log("building inception teacher + shrunk student (host numpy)")
    dist, state, teacher_vars, res = bench.build()
    from cat_tpu.train.common import apply_net, cast_floats

    t_params = cast_floats(teacher_vars["params"], jnp.bfloat16)
    s_params = cast_floats(state.g.params["G"], jnp.bfloat16)
    t_model, s_model = dist.netG_teacher, dist.netG_student

    @jax.jit
    def fwd_t(x):
        return apply_net(t_model, t_params, {}, x, train=False)[0]

    @jax.jit
    def fwd_s(x):
        return apply_net(s_model, s_params, state.g.stats, x, train=False)[0]

    def make_x(b):
        @jax.jit
        def gen(key):
            return jax.random.normal(key, (b, 256, 256, 3), jnp.bfloat16)
        return gen(np.array([0, b], np.uint32))

    log(f"inception: student {res.searched_macs:,} MACs; sweeping "
        f"batches {batches}")
    art = _artifact_forward(
        res.config,
        {"params": state.g.params["G"], "batch_stats": state.g.stats},
        256, 256, "inception",
    )
    return _sweep(fwd_t, fwd_s, make_x, batches, "inception", iters,
                  extra=(("artifact", art),))


def run_spade(batches, iters):
    """gaugan 5p6B recipe: teacher ngf64 vs student @5.6e9 MACs, 512x256."""
    sp = _load_module(os.path.join(_TOOLS, "spade_perf.py"))
    args = type("A", (), dict(
        batch=1, width=512, target_flops=5.6e9, dtype="bfloat16",
        vgg_dtype="bfloat16", packed=True, remat=False, vgg=False,
        ups="more",
    ))()
    log("building SPADE teacher + shrunk student (host numpy)")
    dist, state, teacher_vars, res = sp.build(args)
    from cat_tpu.train.common import cast_floats

    t_params = cast_floats(teacher_vars["params"], jnp.bfloat16)
    t_stats = {k: v for k, v in teacher_vars.items() if k != "params"}
    s_params = cast_floats(state.g.params["G"], jnp.bfloat16)
    s_stats = state.g.stats
    nc = dist.teacher_cfg.semantic_nc

    @jax.jit
    def fwd_t(seg):
        return dist._apply(dist.netG_teacher, t_params, t_stats, seg, False)[0]

    @jax.jit
    def fwd_s(seg):
        return dist._apply(dist.netG_student, s_params, s_stats, seg, False)[0]

    h, w = args.width // 2, args.width  # aspect 2.0, same as spade_perf.build

    def make_x(b):
        @jax.jit
        def gen(key):
            # one-hot-ish segmap: scaled uniform keeps the conv work honest
            return jax.random.uniform(key, (b, h, w, nc), jnp.bfloat16)
        return gen(np.array([0, b], np.uint32))

    log(f"spade: student {res.searched_macs:,} MACs; sweeping "
        f"batches {batches}")
    art = _artifact_forward(
        dist.student_cfg,
        {"params": state.g.params["G"], **state.g.stats},
        args.width // 2, args.width, "spade",
    )
    return _sweep(fwd_t, fwd_s, make_x, batches, "spade", iters,
                  extra=(("artifact", art),))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="both",
                    choices=["inception", "spade", "both"])
    ap.add_argument("--batches", default=None,
                    help="comma-separated batch sweep (default: "
                         "1,32,128 inception / 1,32 spade)")
    ap.add_argument("--iters", type=int, default=10)
    a = ap.parse_args()
    batches = ([int(b) for b in a.batches.split(",")]
               if a.batches else None)
    import cat_tpu  # noqa: F401  (wires the persistent compilation cache)

    if a.family in ("inception", "both"):
        run_inception(batches or [1, 32, 128], a.iters)
    if a.family in ("spade", "both"):
        run_spade(batches or [1, 32], a.iters)


if __name__ == "__main__":
    main()
