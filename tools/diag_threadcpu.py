"""Attach-free JVM/python CPU profile of the no-op Arrow-feed job.

Launches the no-op stage (see diag_noop_sweep) in a subprocess at a
given parallelism, then samples /proc/<pid>/task/*/stat for the java
process and all python workers across the run, reporting per-thread-name
CPU seconds. Shows where the wall time goes without jstack (the sandbox
blocks the JVM attach mechanism).

Usage: python tools/diag_threadcpu.py local[32] 0-31
"""

from __future__ import annotations

import collections
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

HZ = os.sysconf("SC_CLK_TCK")


def task_cpu(pid: int) -> dict[str, float]:
    """comm -> cpu seconds summed over threads (utime+stime)."""
    out: dict[str, float] = collections.defaultdict(float)
    base = f"/proc/{pid}/task"
    try:
        tids = os.listdir(base)
    except OSError:
        return out
    for tid in tids:
        try:
            with open(f"{base}/{tid}/stat") as f:
                parts = f.read().rsplit(")", 1)
            comm = parts[0].split("(", 1)[1]
            fields = parts[1].split()
            out[comm] += (int(fields[11]) + int(fields[12])) / HZ
        except (OSError, IndexError):
            pass
    return out


def find_pids(pattern: str) -> list[int]:
    r = subprocess.run(["pgrep", "-f", pattern], capture_output=True, text=True)
    return [int(p) for p in r.stdout.split()]


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[32]"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "0-31"
    cfg = json.dumps({"master": master, "reps": 4})
    proc = subprocess.Popen(
        ["taskset", "-c", cpus, sys.executable,
         os.path.join(REPO, "tools", "diag_noop_sweep.py"), "--once", cfg],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    # wait for the JVM + warm-up, then bracket the measured reps
    time.sleep(20)
    jpids = find_pids("bin/java")
    wpids = find_pids("pyspark.daemon")
    t0 = time.time()
    j0 = {p: task_cpu(p) for p in jpids}
    w0 = sum(sum(task_cpu(p).values()) for p in wpids)
    time.sleep(15)
    j1 = {p: task_cpu(p) for p in jpids}
    wpids2 = find_pids("pyspark.daemon")
    w1 = sum(sum(task_cpu(p).values()) for p in wpids2)
    wall = time.time() - t0

    agg: dict[str, float] = collections.defaultdict(float)
    for p in jpids:
        for comm, s1 in j1.get(p, {}).items():
            d = s1 - j0.get(p, {}).get(comm, 0.0)
            if d > 0.05:
                agg[comm] += d
    total_j = sum(agg.values())
    print(f"wall sampled: {wall:.1f}s  java CPU: {total_j:.1f}s "
          f"({total_j / wall:.1f} cores)  python CPU: {w1 - w0:.1f}s "
          f"({(w1 - w0) / wall:.1f} cores)")
    for comm, s in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {comm:<18} {s:7.2f}s  ({s / wall:.2f} cores)")
    proc.wait(timeout=300)
    print(proc.stdout.read().strip())


if __name__ == "__main__":
    main()
