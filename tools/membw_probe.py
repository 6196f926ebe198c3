"""Single-node memory-bandwidth scaling probe (8 vs 32 processes).

The steal-free raster rounds plateau near ~0.81 efficiency while the
fixed-cost model predicts ~0.93; the candidate explanation is a shared
single-socket resource (memory bandwidth / LLC) saturating at the
32-core level. This probe measures it directly, JVM-free: N worker
processes (taskset-pinned to distinct cores like the bench legs) each
stream-reduce a private 256 MiB float64 array. Workers allocate first,
then spin until a shared start time, so the measured window contains
ONLY concurrent streaming reads (allocation/page-fault cost on this
VM is pathological — ~18s/GiB — and must stay outside the window).
Aggregate GB/s = total bytes / (latest end - earliest start).
Appends one JSON line per level + a summary to BENCH/membw.jsonl.

Usage: python tools/membw_probe.py [reps_per_worker]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import numpy as np, sys, time
start_at = float(sys.argv[1]); reps = int(sys.argv[2])
a = np.ones(1 << 25, dtype=np.float64)  # 256 MiB, ones() commits pages
while time.time() < start_at:
    pass
t0 = time.time()
s = 0.0
for _ in range(reps):
    s += float(a.sum())
t1 = time.time()
print(t0, t1, s)
"""

GIB = 1 << 28  # bytes per rep (256 MiB)


def run_level(n: int, reps: int, alloc_budget_s: float) -> dict:
    start_at = time.time() + alloc_budget_s
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(i), sys.executable, "-c", WORKER,
             str(start_at), str(reps)],
            stdout=subprocess.PIPE, text=True)
        for i in range(n)
    ]
    spans = []
    for p in procs:
        out, _ = p.communicate()
        t0, t1, _ = out.split()
        spans.append((float(t0), float(t1)))
    window = max(t1 for _, t1 in spans) - min(t0 for t0, _ in spans)
    late = sum(1 for t0, _ in spans if t0 > start_at + 0.5)
    return {
        "n_proc": n,
        "reps": reps,
        "window_sec": round(window, 3),
        "late_starters": late,  # >0 means alloc overran the barrier
        "worker_gb_per_sec": [
            round(reps * GIB / max(t1 - t0, 1e-9) / 1e9, 2) for t0, t1 in spans
        ],
        "aggregate_gb_per_sec": round(n * reps * GIB / window / 1e9, 2),
    }


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    out_path = os.path.join(REPO, "BENCH", "membw.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    try:
        load = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        load = None

    def steal() -> tuple[int, int]:
        vals = [int(v) for v in open("/proc/stat").readline().split()[1:]]
        return (vals[7] if len(vals) > 7 else 0), sum(vals)

    results = {}
    for n in (8, 32):
        s0, t0 = steal()
        # page-fault-in of 256 MiB is slow on this VM and CONTENDS
        # across concurrent workers (observed: 46s budget left 17/32
        # late) — budget generously; the barrier keeps the measured
        # window pure either way, late_starters records any overrun
        rec = run_level(n, reps, alloc_budget_s=30.0 + n * 3.0)
        s1, t1 = steal()
        rec["steal_pct"] = round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2)
        rec["load_before"] = load
        results[n] = rec
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
    scale = (results[32]["aggregate_gb_per_sec"]
             / results[8]["aggregate_gb_per_sec"])
    summary = {
        "bw_scale_8_to_32": round(scale, 3),
        "bw_efficiency": round(scale / 4.0, 3),
        "note": "bw_efficiency is the memory-system analogue of "
                "(T8/T32)/4: 1.0 = bandwidth grew 4x with cores",
    }
    with open(out_path, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
