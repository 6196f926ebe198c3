"""Fixture ε-accuracy sweep — the reference's accuracy experiment
(experiments/run-scripts/raster-accuracy.ps1:21-27, results under
experiments/results-paper/accuracy/raster_<query>_<eps>.csv) reproduced
on the fixture polygons + sf0.01 pages (the real taxi data is not
available in this environment; FIXTURES.md documents the data-blocked
note).

For each ε (microdegrees): grid cell = ε/sqrt(2) (GLFunction.cpp:26-30,
cell diagonal <= ε), raster-join counts + error-bound intervals per
polygon, against the exact PIP counts. Writes BENCH/accuracy_sweep.csv;
tests/test_properties.py asserts the paper's two invariants on the
committed artifact: total |raster-exact| error is monotone non-increasing
as ε shrinks, and the whole-pixel interval always contains the exact
count.

Usage: python tools/accuracy_sweep.py [sf_dir]
"""

from __future__ import annotations

import csv
import math
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# ε sweep in microdegrees (1 μdeg ≈ 0.11 m): spans 4° down to 0.125°,
# i.e. grids from ~30x15 up to ~645x271 cells over the US box
EPS_MDEG = [4_000_000, 2_000_000, 1_000_000, 500_000, 250_000, 125_000]


def run(sf_dir: str = "/root/testdata/sf0.01", out_csv: str | None = None) -> list[dict]:
    from raster_join_spark.fixtures import ORACLE_POLYS, X0, X1, Y0, Y1
    from raster_join_spark.geo.grid import GridSpec
    from raster_join_spark.operators.spatial_join import SpatialJoin
    from raster_join_spark.session import get_spark
    from raster_join_spark.sources.pages import points_df

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    pts = points_df(spark, sf_dir)

    # exact PIP counts (grid-independent oracle side of the sweep)
    from raster_join_spark.fixtures import COARSE_GRID

    exact = {
        r["poly_id"]: r["agg"]
        for r in SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
        .index_join(pts)
        .collect()
    }

    rows: list[dict] = []
    for eps in EPS_MDEG:
        cell = eps / math.sqrt(2.0)
        nx = int(math.ceil((X1 - X0) / cell))
        ny = int(math.ceil((Y1 - Y0) / cell))
        grid = GridSpec(X0, Y0, cell, cell, nx, ny)
        sj = SpatialJoin(spark, ORACLE_POLYS, grid)
        eb = sj.error_bounds(pts).orderBy("poly_id").collect()
        for r in eb:
            p = r["poly_id"]
            rows.append(
                {
                    "eps_mdeg": eps,
                    "n_cells": nx * ny,
                    "poly_id": p,
                    "exact": int(exact[p]),
                    "raster": int(r["cnt"]),
                    "abs_err": abs(int(r["cnt"]) - int(exact[p])),
                    "lo1": int(r["lo1"]),
                    "hi1": int(r["hi1"]),
                    "lo_u6": int(r["lo_u6"]),
                    "hi_u6": int(r["hi_u6"]),
                }
            )
    if out_csv:
        os.makedirs(os.path.dirname(out_csv), exist_ok=True)
        with open(out_csv, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)
        print(f"wrote {len(rows)} rows -> {out_csv}")
    return rows


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    run(sf, os.path.join(ROOT, "BENCH", "accuracy_sweep.csv"))
