"""Flagship benchmark: KA-distillation training throughput, horse2zebra spec.

Measures the FULL optimisation step — frozen teacher (ngf 64) forward,
student (pruned to the reference's 2.6e9-MAC budget) forward/backward, both
Adam updates, KA + GAN + recon losses — at 256x256 on the attached chip, and
prints one JSON line:

  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is measured against the throughput recorded the first time
this benchmark ran (BENCH_BASELINE.json), i.e. round-over-round speedup;
the reference repo publishes no absolute throughput numbers (BASELINE.md).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

import numpy as np

# Zero-XLA numpy init (train/common.init_like): a cold persistent cache paid
# ~2.5 min of XLA:CPU compile PER jitted init before the first JSON line
# could print (round-2 gate: rc=124, no output).  The bench's weights are
# random either way; only shapes/dtypes and the default N(0, 0.02²) init
# distribution matter for throughput.
os.environ.setdefault("CAT_TPU_HOST_INIT", "1")

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
SIZE = 256
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
COMPUTE_DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
WARMUP = 3
ITERS = 10

_T0 = time.perf_counter()


def log(msg: str) -> None:
    """Progress timestamps on stderr so a timeout-killed run is diagnosable
    (the driver's gate reads the LAST stdout JSON line only)."""
    print(f"[bench +{time.perf_counter() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def build():
    from cat_tpu.compress.shrink import PruneBounds, shrink_generator
    from cat_tpu.core.config import InceptionGeneratorConfig, NormConfig
    from cat_tpu.distill.inception_distiller import DistillHParams, InceptionDistiller

    teacher_cfg = InceptionGeneratorConfig.make(
        ngf=64,
        channels=None,
        channels_reduction_factor=6,
        kernel_sizes=(1, 3, 5),
        n_blocks=9,
        norm=NormConfig(kind="instance", affine=True, track_running_stats=False),
    )
    from cat_tpu.models.generator import InceptionGenerator
    from cat_tpu.train.common import init_on_cpu

    teacher = InceptionGenerator(teacher_cfg)
    # raw uint32 threefry key: identical to jax.random.PRNGKey(233) without
    # dispatching an eager program (over the axon tunnel every eager
    # dispatch — even CPU-backend — pays an AOT-loader round trip)
    import numpy as np

    rng = np.array([0, 233], dtype=np.uint32)
    # init on host: ONE jitted CPU program (train/common.init_on_cpu)
    teacher_vars = init_on_cpu(
        lambda: teacher.init(rng, jnp.zeros((1, SIZE, SIZE, 3)))
    )
    log("teacher initialised")

    # Shrink a (randomly-initialised) teacher to the 2.6e9-MAC budget the
    # reference ships for horse2zebra; spread the scales first so the search
    # has signal (a trained teacher's scales are naturally spread).
    # Pure numpy — no eager device dispatches.
    def spread(tree, rs):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = spread(v, rs)
            elif k == "scale":
                out[k] = rs.uniform(0.05, 2.0, np.asarray(v).shape).astype(np.float32)
            else:
                out[k] = v
        return out

    tv = {"params": spread(teacher_vars["params"], np.random.RandomState(0))}
    log("scales spread; running shrink search")
    res = shrink_generator(teacher_cfg, tv, 2.6e9, SIZE, SIZE, PruneBounds(cin_lb=16))

    hp = DistillHParams(
        dataset_mode="unaligned",
        gan_mode="lsgan",
        distill_loss_type="ka",
        lambda_recon=5.0,
        lambda_distill=1.0,
        # production config: bf16 compute (f32 master weights / moments /
        # norm stats / losses); 2x the fp32 batch-8 throughput on v5e
        compute_dtype=COMPUTE_DTYPE,
        fused_norms=os.environ.get("BENCH_FUSED", "0") == "1",
        packed_blocks=os.environ.get("BENCH_PACKED", "1") == "1",
        # opt-in quantised frozen teacher (ops/quant.py); tools/int8_e2e.py
        # builds both variants through this knob for the A/B measurement
        teacher_compute_dtype=os.environ.get("BENCH_TEACHER_DTYPE", ""),
    )
    log(f"shrink done ({res.searched_macs:,} MACs); initialising train state")
    dist = InceptionDistiller(teacher_cfg, res.config, hp=hp)
    state, teacher_vars = dist.init_state(
        np.array([0, 0], dtype=np.uint32), SIZE, SIZE, teacher_vars
    )
    return dist, state, teacher_vars, res


def _real_batches(dataroot, n):
    """Disk -> decode -> collate -> H2D pipeline (BENCH_DATA mode).

    Exercises the production input path: multi-worker JPEG/PNG decode
    (cat_tpu.data.loader.DataLoader) and device double-buffering
    (device_prefetch), instead of synthetic on-device tensors.
    """
    import itertools

    import jax as _jax

    from cat_tpu.data.datasets import UnalignedDataset
    from cat_tpu.data.loader import DataLoader, device_prefetch
    from cat_tpu.data.transforms import TransformSpec

    spec = TransformSpec(preprocess="resize_and_crop", load_size=int(SIZE * 286 / 256),
                         crop_size=SIZE, no_flip=False)
    # load_in_memory caches the decoded+resized uint8 images after the
    # first epoch: decode+resize is ~7ms/image of host time, and this host
    # has ONE core against a >400 img/s step (real pods have dozens; the
    # cache makes small datasets like horse2zebra host-core-independent)
    ds = UnalignedDataset(dataroot, "train", spec, serial_batches=False, seed=0,
                          load_in_memory=True)
    loader = DataLoader(
        ds, BATCH, shuffle=True, seed=0, drop_last=True,
        prefetch=2, num_workers=int(os.environ.get("BENCH_WORKERS", "2")),
    )

    def forever():
        while True:
            yield from loader

    def put(b):
        return {k: _jax.device_put(v) for k, v in b.items() if k in ("A", "B")}

    return itertools.islice(device_prefetch(forever(), put, depth=2), n)


def _device_batches(dataroot, n):
    """HBM-resident bank -> jit-sampled batches (BENCH_DEVICE_DATA mode).

    The production input path for small datasets: the decoded uint8 image
    set is uploaded once and crop/flip/normalised batches are sampled
    inside jit — steady-state host involvement is a PRNG fold per step."""
    import jax as _jax

    from cat_tpu.data.device_data import DeviceData

    dd, _ = DeviceData.from_unaligned(
        dataroot, "train", int(SIZE * 286 / 256), SIZE)
    key = _jax.random.PRNGKey(0)
    for s_ in range(n):
        yield dd.sample(_jax.random.fold_in(key, s_), BATCH)


def _emit(ips: float, res, suffix: str = "", bootstrap: bool = False) -> float:
    """Print one driver-parsable JSON line; returns vs_baseline.

    Called more than once per run (provisional line first, refined line
    after): the driver reads the LAST stdout line, so a timeout mid-refine
    still leaves a valid number — the round-2 gate produced rc=124 with no
    output because the one-shot structure put the only print after ~20 min
    of cold compile (VERDICT.md missing #1)."""
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            base = json.load(f)["images_per_sec"]
    elif not bootstrap:
        # only the final refined measurement may seed the baseline file —
        # persisting a provisional (low-effort-compile or 3-iter) number
        # would inflate every later vs_baseline
        base = ips
    else:
        base = ips
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {
                    "images_per_sec": ips,
                    "note": "round-1 measurement; vs_baseline is round-over-round",
                    "student_macs": res.searched_macs,
                },
                f,
                indent=2,
            )
    print(
        json.dumps(
            {
                "metric": (
                    "horse2zebra KA-distill step throughput (teacher ngf64 + "
                    f"student @2.6e9 MACs, 256px, batch {BATCH}, {COMPUTE_DTYPE}"
                    + suffix + ")"
                ),
                "value": round(ips, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips / base, 4),
            }
        ),
        flush=True,
    )
    return ips / base


def main():
    log(f"building distiller (batch {BATCH}, {COMPUTE_DTYPE}); "
        f"backend={jax.default_backend()}")
    dist, state, teacher_vars, res = build()
    log("state initialised (single jitted CPU init); compiling + running the "
        "train step — a cold persistent cache pays one monolithic XLA compile "
        "here, expect minutes")
    dataroot = os.environ.get("BENCH_DATA")
    devdata = os.environ.get("BENCH_DEVICE_DATA")
    # synthetic batch generated ON device by one small jitted program:
    # device_put of the equivalent ~200MB numpy batch measured 173s over
    # the axon tunnel — pure gate-budget waste for random data
    gen = jax.jit(
        lambda k: {
            "A": jax.random.normal(k, (BATCH, SIZE, SIZE, 3), jnp.float32),
            "B": jax.random.normal(
                jax.random.fold_in(k, 1), (BATCH, SIZE, SIZE, 3), jnp.float32
            ),
        }
    )
    # sync via block_until_ready, NEVER eager indexing: `batch[0,0,0,0]`
    # dispatches eager slice+convert programs, and a cache-cold eager
    # dispatch over the axon tunnel pays a multi-minute AOT-loader
    # round-trip each (round-2's 20-min bench; cold3 lost 14 min here)
    t = time.perf_counter()
    batch = gen(np.array([0, 1], dtype=np.uint32))
    jax.block_until_ready(batch)
    log(f"synthetic batch resident on device ({time.perf_counter() - t:.1f}s "
        "compile+gen)")
    # Two-phase compile so a COLD persistent cache still yields a number well
    # inside the driver's ~10-min gate (VERDICT r2 missing #1; the r3 retest
    # showed the default-effort XLA:TPU compile alone takes 350-480s on this
    # single-core host — pass/fail was load-dependent):
    #   phase 1: exec_time_optimization_effort=-1.0 executable (~37s cold
    #            compile, runs at ~51% of tuned speed) -> emit a measured
    #            provisional line at ~2 min;
    #   phase 2: default-effort executable (same traced HLO, persistent-cache
    #            key shared with any jit of the step) -> re-measure and emit
    #            the real number.  The driver reads the LAST line, so a
    #            timeout mid-phase-2 still records phase 1's measurement.
    lr = jnp.asarray(2e-4, jnp.float32)
    step = dist.train_step
    t_compile = time.perf_counter()
    try:
        lowered = jax.jit(dist._step, donate_argnums=(0,)).lower(
            state, teacher_vars, batch, lr
        )
        log(f"step lowered ({time.perf_counter() - t_compile:.1f}s); "
            "phase-1 low-effort compile")
        t = time.perf_counter()
        fast = lowered.compile(
            compiler_options={"exec_time_optimization_effort": -1.0}
        )
        log(f"low-effort executable in {time.perf_counter() - t:.1f}s")
    except Exception as e:  # pragma: no cover - backend without effort knob
        # nothing has EXECUTED yet (state buffers intact), so falling back
        # to the monolithic jit path below is safe
        log(f"two-phase compile unavailable ({e!r}); monolithic compile")
    else:
        # from the first fast() on, state's input buffers are donated — a
        # failure past this point must never fall back to re-using `state`
        state, metrics = fast(state, teacher_vars, batch, lr)
        float(metrics["G_loss/recon"])  # full device sync (block_until_ready
        # is unreliable over the axon tunnel for non-scalar futures)
        t0 = time.perf_counter()
        for _ in range(3):
            state, metrics = fast(state, teacher_vars, batch, lr)
        float(metrics["G_loss/recon"])
        vsb = _emit(BATCH * 3 / (time.perf_counter() - t0), res,
                    ", provisional: low-effort compile")
        log(f"phase-1 line emitted (vs_baseline {vsb:.3f}); phase-2 "
            "default-effort compile")
        t = time.perf_counter()
        try:
            tuned = lowered.compile()
            log(f"default-effort executable in {time.perf_counter() - t:.1f}s")
        except Exception as e:  # pragma: no cover
            log(f"default-effort compile failed ({e!r}); keeping the "
                "low-effort executable — numbers stay valid, just slower")
            tuned = fast

        def step(state, tv, b, lr_f):  # shadows the jit wrapper on purpose
            return tuned(state, tv, b, jnp.asarray(lr_f, jnp.float32))

    state, metrics = step(state, teacher_vars, batch, 2e-4)
    jax.block_until_ready(metrics)
    log(f"first tuned step done (+{time.perf_counter() - t_compile:.1f}s "
        "since lowering started)")
    for _ in range(WARMUP - 1):
        state, metrics = step(state, teacher_vars, batch, 2e-4)
    float(metrics["G_loss/recon"])

    # provisional number from a short synthetic-fed measurement, printed
    # IMMEDIATELY — everything after this only refines it
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = step(state, teacher_vars, batch, 2e-4)
    float(metrics["G_loss/recon"])
    vsb = _emit(BATCH * 3 / (time.perf_counter() - t0), res)
    log(f"provisional line emitted (vs_baseline {vsb:.3f}); refining with "
        f"{ITERS}-iter measurement")

    if dataroot or devdata:
        # feed the step from disk through the production input pipeline
        stream = (_device_batches(devdata, WARMUP + ITERS) if devdata
                  else _real_batches(dataroot, WARMUP + ITERS))
        for _ in range(WARMUP):
            state, metrics = step(state, teacher_vars, next(stream), 2e-4)
        float(metrics["G_loss/recon"])
        t0 = time.perf_counter()
        for b in stream:
            state, metrics = step(state, teacher_vars, b, 2e-4)
        float(metrics["G_loss/recon"])
    else:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, teacher_vars, batch, 2e-4)
        float(metrics["G_loss/recon"])
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    suffix = ((", disk-fed" if dataroot else "")
              + (", device-bank-fed" if devdata else ""))
    vsb = _emit(ips, res, suffix, bootstrap=True)
    log(f"refined line emitted: {ips:.1f} img/s (vs_baseline {vsb:.3f})")

    # Second-family flagship line: the GauGAN KA-distill step at the
    # reference's 5p6B recipe scale (teacher ngf64, student shrunk to
    # 5.6e9 MACs, 512x256, batch 32, bf16, packed + bf16-VGG, no remat —
    # the measured-best config, tools/spade_perf.py; the remat boundary's
    # layout copies cost 25% at b16 and b32 fits without it).  Runs BY
    # DEFAULT under a wall-clock budget guard (VERDICT r4 #4): the phase
    # only starts if the inception phase left enough of the driver gate's
    # ~10-min window to absorb the 512x256 compile — and uses the same
    # two-phase (low-effort first) compile trick so a provisional SPADE
    # line lands within ~1 min of starting.  BENCH_SPADE=0 skips, =1
    # forces regardless of budget.  The headline inception line is
    # re-emitted LAST either way (the driver parses the last line).
    spade_env = os.environ.get("BENCH_SPADE", "")
    budget_s = float(os.environ.get("BENCH_SPADE_BUDGET_S", "300"))
    elapsed = time.perf_counter() - _T0
    if spade_env == "0":
        log("SPADE phase skipped (BENCH_SPADE=0)")
    elif spade_env != "1" and elapsed > budget_s:
        log(f"SPADE phase skipped: {elapsed:.0f}s elapsed > {budget_s:.0f}s "
            "budget (cold-cache inception phase ate the gate window; the "
            "committed SPADE numbers live in PARITY.md)")
    else:
        try:
            _spade_phase()
        except Exception as e:  # pragma: no cover
            log(f"SPADE phase failed ({e!r}); inception headline stands")
        _emit(ips, res, suffix)


def _spade_phase():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "spade_perf",
        os.path.join(os.path.dirname(__file__), "tools", "spade_perf.py"),
    )
    sp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sp)
    args = type("A", (), dict(
        batch=32, width=512, target_flops=5.6e9, dtype="bfloat16",
        vgg_dtype="bfloat16", packed=True, remat=False, vgg=True,
        ups="more",  # reference SPADE default (spade_model.py:33-38)
        iters=int(os.environ.get("BENCH_SPADE_ITERS", "10")),
    ))()
    log("SPADE phase: building the 5p6B-recipe distiller")
    dist, state, teacher_vars, res = sp.build(args)
    B, H, W = args.batch, args.width // 2, args.width

    @jax.jit
    def make_batch(key):
        kl, ki, km = jax.random.split(key, 3)
        return {
            "label": jax.random.randint(kl, (B, H, W), 0, 35).astype(jnp.float32),
            "instance": jax.random.randint(ki, (B, H, W), 0, 4).astype(jnp.float32),
            "image": jax.random.normal(km, (B, H, W, 3), jnp.float32),
        }

    batch = make_batch(np.array([0, 3], np.uint32))
    jax.block_until_ready(batch)
    log("SPADE phase: batch resident; lowering the fused step")
    lr = jnp.asarray(2e-4, jnp.float32)

    def _emit_spade(ips, suffix=""):
        base = None
        if os.path.exists(BASELINE_PATH):
            with open(BASELINE_PATH) as f:
                blob = json.load(f)
            base = blob.get("spade_images_per_sec")
            if base is None and not suffix:
                blob["spade_images_per_sec"] = ips
                with open(BASELINE_PATH, "w") as f:
                    json.dump(blob, f, indent=2)
        print(json.dumps({
            "metric": ("gaugan-cityscapes KA-distill step throughput (teacher "
                       f"ngf64 + student @{res.searched_macs / 1e9:.2f}e9 MACs, "
                       f"{W}x{H}, batch {B}, bfloat16, packed, bf16-VGG"
                       + suffix + ")"),
            "value": round(ips, 3),
            "unit": "images/sec/chip",
            "vs_baseline": round(ips / (base or ips), 4),
        }), flush=True)
        log(f"SPADE line emitted: {ips:.1f} img/s{suffix}")

    def _measure(step_fn, box):
        m = step_fn(box)
        float(m["G_loss/gan"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            m = step_fn(box)
        float(m["G_loss/gan"])
        return B * args.iters / (time.perf_counter() - t0)

    # same two-phase compile as the inception phase: a measured provisional
    # line lands ~1 min in; the default-effort refine overwrites it (the
    # driver keeps the full stdout tail, so both survive for the record)
    t0 = time.perf_counter()
    lowered = jax.jit(dist._step, donate_argnums=(0,)).lower(
        state, teacher_vars, batch, lr)
    log(f"SPADE step lowered ({time.perf_counter() - t0:.1f}s)")
    box = [state]
    try:
        t0 = time.perf_counter()
        fast = lowered.compile(
            compiler_options={"exec_time_optimization_effort": -1.0})
        log(f"SPADE low-effort executable in {time.perf_counter() - t0:.1f}s")
    except Exception as e:  # pragma: no cover - backend without effort knob
        log(f"SPADE two-phase compile unavailable ({e!r})")
    else:
        def fast_step(bx):
            s, m = fast(bx[0], teacher_vars, batch, lr)
            bx[0] = s
            return m

        _emit_spade(_measure(fast_step, box),
                    ", provisional: low-effort compile")
    t0 = time.perf_counter()
    tuned = lowered.compile()
    log(f"SPADE default-effort executable in {time.perf_counter() - t0:.1f}s")

    def tuned_step(bx):
        s, m = tuned(bx[0], teacher_vars, batch, lr)
        bx[0] = s
        return m

    _emit_spade(_measure(tuned_step, box))


if __name__ == "__main__":
    main()
