"""Standalone reproducer: Spark's per-row MapInBatch wrap is the hybrid
path's scaling ceiling (BENCH/hybrid_rootcause.md, round-3 verdict item 3).

The engine's fused hybrid kernel is a NO-OP python stage plus numpy work
that itself scales (kernel_scaling.jsonl: 8->32 process efficiency ~0.9).
What does not scale is Spark's Arrow INPUT machinery: for every input row
`MapInBatchEvaluatorFactory.$anonfun$eval$1` allocates
`InternalRow(Seq(row))` (an Object[1] + ArraySeq + GenericInternalRow),
then ArrowWriter's StructWriter walks the wrapper per field. That per-row
allocation churn inflates under full-machine-width cache pressure
(measured 0.22 -> 0.36 us/row going 8 -> 32 wide on this host), so a
python stage's FEED degrades exactly when all cores are busy.

This script isolates that term with the minimal possible job: a pure-JVM
`spark.range` feeding an IDENTITY mapInArrow stage (the python side only
counts rows per batch — no engine code at all), run at local[8] and
local[32] in fresh taskset-bound subprocesses on the same input. Any
efficiency below ~1.0 here is framework feed cost, not engine code: the
same job with the python stage REMOVED (pure-JVM count) is the control.

Usage:  python tools/repro_mapinbatch.py            # both levels + control
        python tools/repro_mapinbatch.py --once local[8] 0-7   (internal)

Output: one JSON line with per-level wall seconds, per-row feed cost, and
(T8/T32)/4 efficiencies for the python-stage job vs the pure-JVM control.

Ceiling math (why this bounds hybrid scaling): with per-row feed cost
f8/f32 us at each width and kernel cost k us/row (k scales ~perfectly),
the attainable hybrid efficiency is ((k/4 + f8/4) / (k/4 + f32)) ~=
1 / (1 + (f32 - f8/4 ... )) — for the measured f inflation 0.22->0.36
us/row and k ~= 0.3 us/row, the ceiling is ~0.75-0.85 BEFORE any host
noise, matching the recorded hybrid medians (0.609 all-weather, 0.961
best quiet round).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SPARK_GRAFT_REPRO_N", "400000000"))
PARTS = 256


def _once(master: str) -> dict:
    import pyarrow as pa

    from raster_join_spark.session import get_spark

    spark = get_spark(app_name="repro-mapinbatch", master=master)

    def identity_count(batches):
        for rb in batches:
            yield pa.RecordBatch.from_arrays(
                [pa.array([rb.num_rows], type=pa.int64())], names=["n"]
            )

    df = spark.range(0, N, 1, PARTS).selectExpr(
        "id", "CAST(id % 1000 AS INT) AS v"
    )
    # warm-up: JIT + python worker pool
    spark.range(0, 1_000_000, 1, 8).mapInArrow(
        identity_count, "n long"
    ).groupBy().sum("n").collect()

    def best_of(fn, reps=2):
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        return min(runs)

    t_py = best_of(
        lambda: df.mapInArrow(identity_count, "n long").groupBy().sum("n").collect()
    )
    t_jvm = best_of(lambda: df.groupBy().sum("v").collect())
    return {
        "master": master,
        "rows": N,
        "t_python_noop_sec": round(t_py, 3),
        "t_jvm_control_sec": round(t_jvm, 3),
        "feed_us_per_row": round((t_py - t_jvm) / N * 1e6, 4),
    }


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        print(json.dumps(_once(sys.argv[2])))
        return
    out = {}
    for master, cpus in (("local[8]", "0-7"), ("local[32]", "0-31")):
        r = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, __file__, "--once", master],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        out[master] = json.loads(line)
    rep = {
        "metric": "MapInBatch per-row wrap ceiling (identity python stage vs JVM control)",
        "rows": N,
        "local8": out["local[8]"],
        "local32": out["local[32]"],
        "efficiency_python_noop": round(
            out["local[8]"]["t_python_noop_sec"]
            / out["local[32]"]["t_python_noop_sec"]
            / 4.0,
            3,
        ),
        "efficiency_jvm_control": round(
            out["local[8]"]["t_jvm_control_sec"]
            / out["local[32]"]["t_jvm_control_sec"]
            / 4.0,
            3,
        ),
        "feed_us_per_row_8": out["local[8]"]["feed_us_per_row"],
        "feed_us_per_row_32": out["local[32]"]["feed_us_per_row"],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "mapinbatch_repro.jsonl"), "a") as f:
        f.write(json.dumps(rep) + "\n")
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
