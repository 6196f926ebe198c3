"""Diagnose the fused-hybrid path's 8 -> 32 core scaling.

Decomposes the flagship accurate job into stages, each run at both
parallelism levels (fresh JVM per level, taskset-bound like bench.py):

  gen    : synth_points generation + a JVM aggregate  (no Python at all)
  noop   : mapInPandas that only materializes each Arrow batch as pandas
           and emits one counter row  (generation + Arrow serialize +
           socket + pandas decode; ~zero Python compute)
  hybrid : the real fused kernel (same code path as _fused_agg), with
           per-task instrumentation: python process CPU seconds, wall
           span inside the worker, batches, rows, worker pid

If gen scales but noop doesn't -> the Arrow pipe (JVM serialize or
socket or pandas decode) is the serial component. If noop scales but
hybrid doesn't -> the kernel contends (memory bandwidth / page faults).
If per-task python CPU >> kernel time -> decode overhead. If total
python CPU ~ equal at both levels but wall doesn't drop -> workers are
starved (oversubscription with JVM threads under taskset).

Usage:  python tools/diag_hybrid.py            # both levels, comparison
        python tools/diag_hybrid.py --once local[8] 0-7   # one level
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("SPARK_GRAFT_DIAG_N", "50000000"))
PARTS = int(os.environ.get("SPARK_GRAFT_DIAG_PARTS", "256"))


def _instrumented_hybrid(spark, n: int):
    """The _fused_agg plan with worker-side timing rows appended."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
    from raster_join_spark.geo.classify import POLY_GRID_CACHE
    from raster_join_spark.geo.pip import pip_candidates
    from raster_join_spark.operators.spatial_join import _cell_csr, _csr_expand
    from raster_join_spark.sources.pages import synth_points

    t = POLY_GRID_CACHE.get(COARSE_GRID, ORACLE_POLYS)
    int_c, int_p = t.interior_pairs()
    b_c, b_p, _, _ = t.boundary_pairs()
    bc = spark.sparkContext.broadcast(
        {
            "interior": _cell_csr(int_c, int_p, COARSE_GRID.n_cells),
            "boundary": _cell_csr(b_c, b_p, COARSE_GRID.n_cells),
            "verts": ORACLE_POLYS.verts,
            "offsets": ORACLE_POLYS.offsets,
        }
    )
    grid = COARSE_GRID
    n_polys = ORACLE_POLYS.n_polys

    schema = T.StructType(
        [
            T.StructField("kind", T.StringType(), False),
            T.StructField("poly_id", T.LongType(), False),
            T.StructField("_cnt", T.LongType(), False),
            T.StructField("pid", T.LongType(), False),
            T.StructField("cpu_s", T.DoubleType(), False),
            T.StructField("kern_s", T.DoubleType(), False),
            T.StructField("wall_s", T.DoubleType(), False),
            T.StructField("batches", T.LongType(), False),
            T.StructField("rows", T.LongType(), False),
        ]
    )

    def fn(batches):
        art = bc.value
        verts, offsets = art["verts"], art["offsets"]
        t0w = time.perf_counter()
        t0c = time.process_time()
        kern = 0.0
        nb = 0
        nr = 0
        agg = np.zeros(n_polys, np.int64)
        for pdf in batches:
            k0 = time.perf_counter()
            x = pdf["x"].to_numpy(np.float64)
            y = pdf["y"].to_numpy(np.float64)
            cells = grid.cell_ids_np(x, y)
            cnt = np.zeros(n_polys, np.int64)
            ri, pi = _csr_expand(art["interior"], cells)
            if len(ri):
                cnt += np.bincount(pi, minlength=n_polys)
            rb, pb = _csr_expand(art["boundary"], cells)
            if len(rb):
                m = pip_candidates(x[rb], y[rb], pb, verts, offsets)
                cnt += np.bincount(pb[m], minlength=n_polys)
            agg += cnt
            kern += time.perf_counter() - k0
            nb += 1
            nr += len(x)
        nz = np.nonzero(agg)[0]
        out = pd.DataFrame(
            {
                "kind": "agg",
                "poly_id": nz.astype(np.int64),
                "_cnt": agg[nz],
                "pid": 0, "cpu_s": 0.0, "kern_s": 0.0, "wall_s": 0.0,
                "batches": 0, "rows": 0,
            }
        )
        stat = pd.DataFrame(
            {
                "kind": ["stat"], "poly_id": [-1], "_cnt": [0],
                "pid": [os.getpid()],
                "cpu_s": [time.process_time() - t0c],
                "kern_s": [kern],
                "wall_s": [time.perf_counter() - t0w],
                "batches": [nb], "rows": [nr],
            }
        )
        yield pd.concat([out, stat], ignore_index=True)

    target = max(spark.sparkContext.defaultParallelism, 1)
    src = synth_points(spark, n, PARTS).select("x", "y")
    if src.rdd.getNumPartitions() > 2 * target:
        src = src.coalesce(2 * target)
    return src.mapInPandas(fn, schema)


def run_once(master: str) -> dict:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from raster_join_spark.session import get_spark
    from raster_join_spark.sources.pages import synth_points

    spark = get_spark(app_name="diag-hybrid", master=master)
    # warm-up: JIT, python workers, broadcast
    _instrumented_hybrid(spark, 2_000_000).collect()

    out: dict = {"master": master, "n": N}

    t0 = time.perf_counter()
    synth_points(spark, N, PARTS).agg(F.sum("x")).collect()
    out["gen_s"] = round(time.perf_counter() - t0, 3)

    # no-op python stage: decode each Arrow batch to pandas, emit 1 row
    noop_schema = T.StructType([T.StructField("rows", T.LongType(), False)])

    def noop(batches):
        import pandas as pd

        nr = 0
        for pdf in batches:
            nr += len(pdf)
        yield pd.DataFrame({"rows": [nr]})

    target = max(spark.sparkContext.defaultParallelism, 1)
    src = synth_points(spark, N, PARTS).select("x", "y")
    if src.rdd.getNumPartitions() > 2 * target:
        src = src.coalesce(2 * target)
    t0 = time.perf_counter()
    src.mapInPandas(noop, noop_schema).agg(F.sum("rows")).collect()
    out["noop_s"] = round(time.perf_counter() - t0, 3)

    t0 = time.perf_counter()
    rows = _instrumented_hybrid(spark, N).collect()
    out["hybrid_s"] = round(time.perf_counter() - t0, 3)

    stats = [r for r in rows if r["kind"] == "stat"]
    out["tasks"] = len(stats)
    out["workers"] = len({r["pid"] for r in stats})
    out["py_cpu_s"] = round(sum(r["cpu_s"] for r in stats), 3)
    out["py_kern_s"] = round(sum(r["kern_s"] for r in stats), 3)
    out["py_wall_s"] = round(sum(r["wall_s"] for r in stats), 3)
    out["py_rows"] = sum(r["rows"] for r in stats)
    out["py_batches"] = sum(r["batches"] for r in stats)
    try:
        out["load_after"] = float(open("/proc/loadavg").read().split()[0])
    except OSError:
        out["load_after"] = -1.0
    return out


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        master = sys.argv[2]
        print(json.dumps(run_once(master)))
        return
    results = {}
    for master, cpus in (("local[8]", "0-7"), ("local[32]", "0-31")):
        r = subprocess.run(
            ["taskset", "-c", cpus, sys.executable, __file__, "--once", master],
            capture_output=True, text=True, check=True,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        results[master] = json.loads(line)
    a, b = results["local[8]"], results["local[32]"]
    cmp = {
        "n": N,
        "eff_gen": round(a["gen_s"] / b["gen_s"] / 4.0, 3),
        "eff_noop": round(a["noop_s"] / b["noop_s"] / 4.0, 3),
        "eff_hybrid": round(a["hybrid_s"] / b["hybrid_s"] / 4.0, 3),
        "local8": a,
        "local32": b,
    }
    print(json.dumps(cmp, indent=2))


if __name__ == "__main__":
    main()
