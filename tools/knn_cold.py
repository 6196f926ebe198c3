"""Attribute the knn_join_bulk cold-sample tax (round-6 verdict,
What's wrong #3): run the bench-shaped bulk-kNN query several times in
one session with the operator's per-phase wall timings enabled, and
report where sample 1 spends its extra seconds relative to warmed
samples. Appends one JSON line per sample to
BENCH/knn_bulk_cold.jsonl; the analysis narrative lives in
BENCH/knn_bulk_cold.md. Usage:

  python tools/knn_cold.py [sf_dir] [samples]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from raster_join_spark.fixtures import COARSE_GRID, KNN_K
    from raster_join_spark.operators.knn import knn_join_bulk
    from raster_join_spark.session import get_spark
    from __spark_entry__ import KNN_BULK_MOD, _events_count, _points

    spark = get_spark(app_name="knn-cold", master="local[32]")
    out_path = os.path.join(REPO, "BENCH", "knn_bulk_cold.jsonl")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    for i in range(samples):
        pts = _points(spark, sf_dir)
        qdf = pts.filter((F.col("event_id") % KNN_BULK_MOD) == 0).select(
            F.col("event_id").alias("q_id"),
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
        )
        stats: dict = {}
        t0 = time.perf_counter()
        knn_join_bulk(
            spark, pts, COARSE_GRID, qdf, KNN_K, stats=stats,
            n_total=_events_count(spark, sf_dir),
        ).count()
        wall = round(time.perf_counter() - t0, 3)
        try:
            load = float(open("/proc/loadavg").read().split()[0])
        except OSError:
            load = None
        rec = {
            "sample": i + 1,
            "sf_dir": sf_dir,
            "wall_sec": wall,
            "phase_sec": stats.get("phase_sec"),
            "rounds": stats.get("rounds"),
            "load_after": load,
        }
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
