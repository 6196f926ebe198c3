"""Hybrid-only adjacent A/B scaling pairs (cheap: no 4B raster leg).

Waits for a quiet host, then runs the fused hybrid at local[8] and
local[32] back-to-back (fresh JVM + taskset each), appending pairs to
BENCH/hybrid_ab.jsonl. Usage: python tools/hybrid_ab.py [n_pairs].
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = int(os.environ.get("SPARK_GRAFT_AB_N", "400000000"))


def run_once(master: str) -> float:
    code = f"""
import time
from raster_join_spark.session import get_spark
from raster_join_spark.sources.pages import synth_points
from raster_join_spark.fixtures import ORACLE_POLYS, COARSE_GRID
from raster_join_spark.operators.spatial_join import SpatialJoin
spark = get_spark(app_name="hybrid-ab", master="{master}")
sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
sj.hybrid_join(synth_points(spark, 2_000_000, 256)).collect()
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    sj.hybrid_join(synth_points(spark, {N}, 256)).collect()
    best = min(best, time.perf_counter() - t0)
print("RESULT", round(best, 3))
"""
    cpus = "0-7" if master == "local[8]" else "0-31"
    r = subprocess.run(
        ["taskset", "-c", cpus, sys.executable, "-c", code],
        capture_output=True, text=True, check=True,
    )
    return float(
        [l for l in r.stdout.splitlines() if l.startswith("RESULT")][-1].split()[1]
    )


def load1() -> float:
    return float(open("/proc/loadavg").read().split()[0])


def main() -> None:
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    got = 0
    path = os.path.join(REPO, "BENCH", "hybrid_ab.jsonl")
    while got < pairs:
        if os.path.exists("/tmp/stop_quiet_scaling"):
            return
        if load1() >= 2.0:
            time.sleep(30)
            continue
        time.sleep(10)
        if load1() >= 2.0:
            continue
        t8 = run_once("local[8]")
        t32 = run_once("local[32]")
        rec = {
            "n": N, "t8": t8, "t32": t32,
            "eff": round(t8 / t32 / 4.0, 3), "load_after": load1(),
        }
        with open(path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        got += 1
        time.sleep(45)


if __name__ == "__main__":
    main()
