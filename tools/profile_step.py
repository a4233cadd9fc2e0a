"""Capture a device profile of the flagship distill step and print a top-op table.

Substantiates PARITY.md's roofline argument with an actual device trace
instead of component-level timing (tools/perf_probe.py): runs the same
step bench.py measures under ``jax.profiler.trace`` and aggregates the
XLA-op track of the resulting Chrome/Perfetto trace into a top-K table of
device time by fused-op name.

Usage:
    python tools/profile_step.py [--steps 5] [--out /tmp/cat_trace]
    python tools/profile_step.py --parse /tmp/cat_trace   # re-parse only

The trace directory is the standard TensorBoard layout
(plugins/profile/<run>/*.trace.json.gz); the parser needs only
gzip+json so it works in this zero-extra-deps environment.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(out_dir: str, steps: int) -> None:
    import importlib

    import jax
    import numpy as np

    bench = importlib.import_module("bench")
    bench.log = lambda m: print(f"[profile] {m}", file=sys.stderr, flush=True)
    dist, state, teacher_vars, res = bench.build()
    # synthetic batch generated ON device (bench.py rationale: a 200MB
    # device_put costs ~3 min over the axon tunnel)
    import jax.numpy as jnp

    gen = jax.jit(
        lambda k: {
            "A": jax.random.normal(k, (bench.BATCH, bench.SIZE, bench.SIZE, 3), jnp.float32),
            "B": jax.random.normal(
                jax.random.fold_in(k, 1),
                (bench.BATCH, bench.SIZE, bench.SIZE, 3), jnp.float32),
        }
    )
    batch = gen(np.array([0, 1], dtype=np.uint32))
    # compile + warm OUTSIDE the trace so the capture is steady-state only
    for _ in range(3):
        state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
    jax.block_until_ready(metrics)
    print(f"[profile] warm; tracing {steps} steps -> {out_dir}", file=sys.stderr)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, metrics = dist.train_step(state, teacher_vars, batch, 2e-4)
        jax.block_until_ready(metrics)
    print("[profile] trace captured", file=sys.stderr)


def capture_spade(out_dir: str, steps: int, batch: int,
                  remat: bool = True) -> None:
    """Trace the GauGAN flagship step (the 5p6B reference recipe scale that
    tools/spade_perf.py times): teacher ngf64 + student ngf48 shrunk to
    5.6e9 MACs, 512x256, hinge+feat+VGG(bf16), packed SPADE blocks, remat."""
    import argparse as _ap
    import importlib

    import jax
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    sp = importlib.import_module("spade_perf")
    sp.log = lambda m: print(f"[profile] {m}", file=sys.stderr, flush=True)
    args = _ap.Namespace(
        batch=batch, width=512, target_flops=5.6e9, dtype="bfloat16",
        vgg_dtype="bfloat16", packed=True, remat=remat, vgg=True,
        ups="more",  # reference SPADE default (spade_model.py:33-38)
    )
    dist, state, teacher_vars, res = sp.build(args)
    import jax.numpy as jnp

    B, H, W = batch, args.width // 2, args.width

    @jax.jit
    def make_batch(key):
        kl, ki, km = jax.random.split(key, 3)
        return {
            "label": jax.random.randint(kl, (B, H, W), 0, 35).astype(jnp.float32),
            "instance": jax.random.randint(ki, (B, H, W), 0, 4).astype(jnp.float32),
            "image": jax.random.normal(km, (B, H, W, 3), jnp.float32),
        }

    batch_d = make_batch(np.array([0, 3], dtype=np.uint32))
    float(sp._scalar_probe(batch_d))
    for _ in range(3):
        state, metrics = dist.train_step(state, teacher_vars, batch_d, 2e-4)
    float(sp._scalar_probe(metrics))
    print(f"[profile] warm; tracing {steps} spade steps -> {out_dir}",
          file=sys.stderr)
    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, metrics = dist.train_step(state, teacher_vars, batch_d, 2e-4)
        float(sp._scalar_probe(metrics))
    print("[profile] trace captured", file=sys.stderr)


def _load_events(trace_dir: str):
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    ) or sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json"), recursive=True))
    if not paths:
        raise SystemExit(f"no *.trace.json[.gz] under {trace_dir}")
    path = paths[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", data)


def parse_categories(trace_dir: str, top: int = 12) -> None:
    """Aggregate the XLA-op lane by hlo_category with achieved FLOP/s and
    HBM bytes — the roofline view (args carried per op by the TPU trace:
    hlo_category / model_flops / bytes_accessed / source)."""
    path, events = _load_events(trace_dir)
    track_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid")) if e["name"] == "thread_name" else (e.get("pid"), None)
            track_names[key] = e.get("args", {}).get("name", "")
    cat = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # dur_us, flops, bytes, n
    src = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        label = (track_names.get((e.get("pid"), e.get("tid")), "") or "")
        if "XLA Ops" not in (track_names.get((e.get("pid"), None), "") + label):
            continue
        a = e.get("args", {})
        dur = float(e.get("dur", 0.0))
        c = cat[a.get("hlo_category", "?")]
        c[0] += dur
        c[1] += float(a.get("model_flops", 0) or 0)
        c[2] += float(a.get("bytes_accessed", 0) or 0)
        c[3] += 1
        s = a.get("source", "")
        if s:
            src[s][0] += dur
            src[s][1] += 1
        total += dur
    print(f"trace file: {os.path.relpath(path, trace_dir)}")
    print(f"total device-op time {total/1e3:.1f} ms\n")
    print("| hlo_category | ms | share | TFLOP/s | GB/s | ops |")
    print("|---|---|---|---|---|---|")
    for name, (dur, fl, by, n) in sorted(cat.items(), key=lambda kv: -kv[1][0])[:top]:
        tfs = fl / (dur * 1e-6) / 1e12 if dur else 0.0
        gbs = by / (dur * 1e-6) / 1e9 if dur else 0.0
        print(f"| {name} | {dur/1e3:.1f} | {100*dur/total:.1f}% | "
              f"{tfs:.1f} | {gbs:.0f} | {n} |")
    tf_all = sum(v[1] for v in cat.values())
    by_all = sum(v[2] for v in cat.values())
    print(f"\nwhole-step achieved: {tf_all/(total*1e-6)/1e12:.1f} TFLOP/s, "
          f"{by_all/(total*1e-6)/1e9:.0f} GB/s of HBM traffic")
    print("\ntop source lines by device time:")
    for s, (dur, n) in sorted(src.items(), key=lambda kv: -kv[1][0])[:10]:
        print(f"  {dur/1e3:8.1f} ms  {n:5d} ops  {s}")


def parse(trace_dir: str, top: int = 12) -> None:
    path, events = _load_events(trace_dir)
    # device tracks: pid/tid metadata names containing "TPU"/"XLA Ops"-style
    # lanes.  Collect complete events (ph == "X") grouped per track name so
    # the op lane (not the host python lane) can be selected.
    track_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") in ("process_name", "thread_name"):
            key = (e.get("pid"), e.get("tid")) if e["name"] == "thread_name" else (e.get("pid"), None)
            track_names[key] = e.get("args", {}).get("name", "")
    per_track = defaultdict(lambda: defaultdict(float))
    track_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        tname = track_names.get((pid, tid), "") or track_names.get((pid, None), "")
        pname = track_names.get((pid, None), "")
        label = f"{pname}/{tname}"
        dur = float(e.get("dur", 0.0))
        per_track[label][e.get("name", "?")] += dur
        track_total[label] += dur
    # choose the per-op device lane: "XLA Ops" on TPU (the "Steps" / "XLA
    # Modules" lanes aggregate whole steps and carry no op names)
    def is_device(label: str) -> bool:
        l = label.lower()
        return ("tpu" in l or "xla" in l or "device" in l) and "host" not in l

    op_lanes = [t for t in track_total if "xla ops" in t.lower()]
    candidates = (op_lanes or [t for t in track_total if is_device(t)]
                  or list(track_total))
    busiest = max(candidates, key=lambda t: track_total[t])
    ops = per_track[busiest]
    total = sum(ops.values())
    print(f"trace file: {os.path.relpath(path, trace_dir)}")
    print(f"track: {busiest}  |  total device-op time {total/1e3:.1f} ms")
    print(f"\n| # | op | ms | share |")
    print("|---|---|---|---|")
    for i, (name, dur) in enumerate(
        sorted(ops.items(), key=lambda kv: -kv[1])[:top], 1
    ):
        print(f"| {i} | `{name[:90]}` | {dur/1e3:.2f} | {100*dur/total:.1f}% |")
    rest = total - sum(d for _, d in sorted(ops.items(), key=lambda kv: -kv[1])[:top])
    print(f"| | (remaining {len(ops)-top} ops) | {rest/1e3:.2f} | {100*rest/total:.1f}% |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--out", default="/tmp/cat_trace")
    ap.add_argument("--parse", metavar="DIR", default=None,
                    help="skip capture; parse an existing trace dir")
    ap.add_argument("--top", type=int, default=12)
    ap.add_argument("--spade", action="store_true",
                    help="trace the GauGAN 512x256 flagship step instead")
    ap.add_argument("--batch", type=int, default=16,
                    help="per-chip batch for --spade")
    ap.add_argument("--remat", type=int, default=1,
                    help="--spade remat toggle (0 = the pinned b32 no-remat "
                         "shipped config)")
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.top)
        parse_categories(args.parse, args.top)
        return
    if args.spade:
        capture_spade(args.out, args.steps, args.batch,
                      remat=bool(args.remat))
        parse(args.out, args.top)
        parse_categories(args.out, args.top)
        return
    capture(args.out, args.steps)
    parse(args.out, args.top)
    parse_categories(args.out, args.top)


if __name__ == "__main__":
    main()
