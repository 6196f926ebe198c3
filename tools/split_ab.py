"""Recorded A/B of the accurate hybrid plans: fused one-pass Arrow
kernel vs the r7 hierarchical split (interior resolved JVM-side via
chained broadcast probes, ~2% of points through Arrow).

Appends one JSON line per plan to BENCH/split_ab.jsonl:
  {"n", "master", "plan", "secs": [...], "best", "docs_per_sec", "load_after"}

This is the evidence file the spatial_join docstrings cite for the
fused='auto' -> split decision. Input is UNCACHED synthetic points
(fresh plan per rep, CLAUDE.md bench rules). Usage:

  python tools/split_ab.py [N] [master] [reps] [label]

``label`` tags the rows (e.g. the plan variant under test) so the
series stays self-describing as the operator evolves.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000_000
    master = sys.argv[2] if len(sys.argv) > 2 else "local[32]"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    label = sys.argv[4] if len(sys.argv) > 4 else None

    from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
    from raster_join_spark.operators.spatial_join import SpatialJoin
    from raster_join_spark.session import get_spark
    from raster_join_spark.sources.pages import synth_points

    spark = get_spark(app_name="split-ab", master=master)
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)

    # warm both plans (JVM JIT, python workers, broadcast artifacts)
    for fused in (True, "split"):
        sj.hybrid_join(
            synth_points(spark, 2_000_000, 64), fused=fused, coord_transfer="packed"
        ).collect()

    out_path = os.path.join(REPO, "BENCH", "split_ab.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    for plan, fused in (("fused", True), ("split", "split")):
        secs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sj.hybrid_join(
                synth_points(spark, n, 256), fused=fused, coord_transfer="packed"
            ).collect()
            secs.append(round(time.perf_counter() - t0, 3))
        try:
            load = float(open("/proc/loadavg").read().split()[0])
        except OSError:
            load = None
        rec = {
            "n": n,
            "master": master,
            "plan": plan,
            "secs": secs,
            "best": min(secs),
            "docs_per_sec": round(n / min(secs), 1),
            "load_after": load,
        }
        if label:
            rec["label"] = label
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
