"""Full user journey: crawl pages table -> tile store -> pruned read ->
constrained accurate spatial aggregation -> reference-format output.
This is the workflow a reference user ports 1:1 (SURVEY §3 lifecycle)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
from raster_join_spark.geo.pip import pip_multi
from raster_join_spark.operators.output import write_poly_results
from raster_join_spark.plans.query import (
    Aggregation,
    ConstraintType,
    QueryConstraint,
    QueryEngine,
)
from raster_join_spark.sources.pages import pages_df, points_df
from raster_join_spark.sources.tiles import TileStore


def test_full_pipeline(spark, sf_dir, tmp_path):
    # 1. ingest: pages table (input_hint shape) -> extracted points
    pages = pages_df(spark, sf_dir)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    pts = points_df(spark, sf_dir)

    # 2. index build (reference BackendIndex): partitioned tile store
    store = TileStore(str(tmp_path / "store"), COARSE_GRID, n_buckets=8, salt=4,
                      salt_threshold=200)
    manifest = store.write(pts, ts_now=1.0)
    assert manifest["snapshot_id"] == 1

    # 3. query: coarse window + constraints + accurate hybrid aggregation
    stored = store.read(spark)
    eng = QueryEngine(spark, stored, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    eng.set_query_constraints([QueryConstraint("lang", ConstraintType.EQ, "purchase")])
    eng.set_aggregation(Aggregation.COUNT)
    got = eng.execute_function("hybrid").orderBy("poly_id").toPandas()

    # 4. oracle: brute-force numpy over the same filtered points
    pdf = pts.filter(F.col("lang") == "purchase").toPandas()
    _, poly_ids = pip_multi(
        pdf.x.to_numpy(), pdf.y.to_numpy(), ORACLE_POLYS.verts, ORACLE_POLYS.offsets
    )
    exp = np.bincount(poly_ids, minlength=ORACLE_POLYS.n_polys)
    np.testing.assert_array_equal(got["agg"].to_numpy(), exp)

    # 5. output: reference-format TSV
    path = write_poly_results(
        eng.execute_function("hybrid"), str(tmp_path), end_time=42, eps=0
    )
    lines = open(path).read().strip().split("\n")
    assert [int(l.split("\t")[1]) for l in lines] == exp.tolist()

    # 6. invariant: text bytes unchanged per url through store roundtrip
    a = pages.select("url", "text").toPandas().set_index("url")["text"].sort_index()
    b = (
        store.read(spark).select("url", "text").toPandas()
        .set_index("url")["text"].sort_index()
    )
    assert (a == b).all()
