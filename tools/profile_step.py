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
    # choose the busiest device-looking track (XLA op lanes)
    def is_device(label: str) -> bool:
        l = label.lower()
        return ("tpu" in l or "xla" in l or "device" in l) and "host" not in l

    candidates = [t for t in track_total if is_device(t)] or list(track_total)
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
    args = ap.parse_args()
    if args.parse:
        parse(args.parse, args.top)
        return
    capture(args.out, args.steps)
    parse(args.out, args.top)


if __name__ == "__main__":
    main()
