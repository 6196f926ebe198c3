"""Regenerate docs/PLANS.md: captured .explain('formatted') output for the
key operators, with commentary. See tests/test_plans.py for the asserted
plan properties."""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import functions as F

    from raster_join_spark.fixtures import COARSE_GRID, FINE_GRID, ORACLE_POLYS
    from raster_join_spark.operators.spatial_join import SpatialJoin
    from raster_join_spark.session import get_spark
    from raster_join_spark.sources.pages import points_df

    spark = get_spark(master="local[4]", shuffle_partitions=8)
    sf = "/root/testdata/sf0.001"

    def plan_of(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    sjf = SpatialJoin(spark, ORACLE_POLYS, FINE_GRID)
    pts = points_df(spark, sf)

    sections = [
        (
            "Fused hybrid join (flagship, J3)",
            "One MapInPandas pass emits <=16-row partial vectors per Arrow "
            "batch; the only hash exchange carries partials, never points. "
            "Filters on the events scan are pushed; `text`/`html` are pruned.",
            plan_of(sj.hybrid_join(pts, include_zero=False)),
        ),
        (
            "Raster join (J1) — pure JVM",
            "Cell pre-aggregation (partial+final) then a broadcast hash join "
            "against the driver-rasterized cover table; zero Python operators.",
            plan_of(sjf.raster_join(pts, include_zero=False)),
        ),
        (
            "Index join (J2)",
            "Broadcast MBR-candidate join + Arrow PIP filter; no SortMergeJoin.",
            plan_of(sj.index_join(pts, include_zero=False)),
        ),
        (
            "Filtered scan (F1 + S6)",
            "Attribute constraints reach the parquet scan as PushedFilters.",
            plan_of(
                pts.filter(
                    (F.col("lang") == "purchase") & (F.col("value_c") > 2000)
                ).select("url", "x", "y")
            ),
        ),
    ]

    sections += [
        (
            "Fused hybrid join with packed coordinate transfer",
            "coord_transfer='packed': both int32-exact coords in ONE int64 "
            "column (shiftleft/or, pure JVM) — half the Arrow feed bytes of "
            "float64 and half the per-row field count "
            "(BENCH/hybrid_rootcause.md). Same exchange shape as the fused "
            "plan; results bit-identical (driver-gated).",
            plan_of(
                sj.hybrid_join(pts, include_zero=False, coord_transfer="packed")
            ),
        ),
    ]

    from raster_join_spark.operators.knn import knn_join_bulk

    qdf = pts.filter((F.col("event_id") % 10) == 0).select(
        F.col("event_id").alias("q_id"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    # dense fixture: forces the ROUND path (the sf0.001 pages are so
    # sparse relative to COARSE_GRID that the disk would cover most of
    # the grid and the operator correctly takes the exhaustive fallback
    # — captured separately below)
    import numpy as np
    import pandas as pd

    from raster_join_spark.geo.grid import GridSpec

    rng = np.random.RandomState(3)
    n_dense = 20_000
    dense_pts = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": np.arange(n_dense, dtype=np.int64),
                "x": rng.uniform(0, 1000, n_dense).round(),
                "y": rng.uniform(0, 1000, n_dense).round(),
            }
        )
    )
    dense_grid = GridSpec(0.0, 0.0, 10.0, 10.0, 100, 100)
    dense_q = dense_pts.filter((F.col("event_id") % 40) == 0).select(
        F.col("event_id").alias("q_id"),
        F.col("x").alias("qx"),
        F.col("y").alias("qy"),
    )
    sections += [
        (
            "Bulk kNN round plan (cogrouped block kernel, J6 at table scale)",
            "Each pending query explodes its probe disk JVM-side "
            "(sequence x sequence -> cell ids); points are pruned to probed "
            "cells by a broadcast LEFT-SEMI join, then probes and points "
            "COGROUP by cell_id into a numpy block kernel "
            "(FlatMapCoGroupsInPandas) that emits <= k rows per (query, "
            "cell) — the Arrow transfer is O(probes + points), never the "
            "(query, candidate) pair set, so hot-cell skew cannot blow up "
            "the exchange. The per-query global top-k then reduces in-plan "
            "(map-side combined collect_list -> array_sort -> slice; no "
            "Window) and certifies in-plan; the union of per-round "
            "certified results stays distributed.",
            plan_of(
                knn_join_bulk(
                    spark, dense_pts, dense_grid, dense_q, 5, n_total=n_dense
                )
            ),
        ),
        (
            "Bulk kNN exhaustive fallback (sparse data / giant disk)",
            "When the probe disk would exceed max_cells_per_query (or "
            "max_rounds), pending queries resolve by ONE broadcast "
            "nested-loop pass against all points — the intended plan "
            "exactly when disks would have covered most of the grid.",
            plan_of(knn_join_bulk(spark, pts, COARSE_GRID, qdf, 5, n_total=1000)),
        ),
    ]

    from raster_join_spark.operators.dedup import minhash_lsh_pairs, simhash

    docs_df = spark.read.parquet(f"{sf}/documents.parquet")
    sections += [
        (
            "SimHash (pure JVM)",
            "Explode words -> md5-derived bit votes -> ONE map-side-combined "
            "hash aggregate (64 sums) -> repack. No Python operator; the "
            "exchange carries <= one row per doc per task.",
            plan_of(simhash(docs_df)),
        ),
        (
            "MinHash banded LSH pairs (pure JVM)",
            "Explode shingles -> 64 min-aggregates (map-side combined) -> "
            "band slices as join keys -> capped self-join. No Python operator.",
            plan_of(minhash_lsh_pairs(docs_df, k=64, bands=16, shingle_w=3)),
        ),
    ]

    from raster_join_spark.operators.sampling import split_assign
    from raster_join_spark.plans.pipeline import prepare_corpus

    pairs_df = minhash_lsh_pairs(docs_df, k=64, bands=16, shingle_w=3)
    sections += [
        (
            "Leakage-safe split (cluster-hash assignment)",
            "Corpus scan -> BROADCAST hash join against the "
            "connected-components label table (checkpoint-backed, so the "
            "broadcast is hinted — without it the planner SortMergeJoins "
            "and shuffles the whole corpus) -> stateless salted-md5 "
            "decision per row. No Window, no Cartesian.",
            plan_of(split_assign(docs_df, pairs_df, test_permille=200)),
        ),
        (
            "Composed corpus pipeline (filter -> dedup -> split)",
            "The keep decision is the predicate cluster_id == doc_id on "
            "the assignment frame, so the composed plan stays: one "
            "document scan (language/quality predicates evaluated in the "
            "scan stage) -> broadcast label join -> filter -> project. "
            "The iterative CC rounds run once, up front, over the pair "
            "list only.",
            plan_of(prepare_corpus(docs_df, test_permille=200)),
        ),
    ]
    out = [
        "# Physical plans (captured from .explain('formatted'))",
        "",
        "Regenerate with `python tools/dump_plans.py`. Assertions over these",
        "properties live in `tests/test_plans.py`.",
        "",
    ]
    for title, blurb, plan in sections:
        out += [f"## {title}", "", blurb, "", "```", plan.strip(), "```", ""]
    docs = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs")
    os.makedirs(docs, exist_ok=True)
    with open(os.path.join(docs, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(os.path.join(docs, "PLANS.md"))


if __name__ == "__main__":
    main()
