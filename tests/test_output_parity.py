"""Result writer (X1) + reference avg-encoding parity (A2) + mercator
Spark-vs-numpy bit parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
from raster_join_spark.geo.mercator import geo2world_cols, transform_points_np
from raster_join_spark.operators.output import (
    decode_avg_hi_lo,
    encode_sum_hi_lo,
    write_error_bounds,
    write_poly_results,
)
from raster_join_spark.operators.spatial_join import SpatialJoin
from raster_join_spark.sources.pages import points_df


def test_write_poly_results_format(spark, sf_dir, tmp_path):
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    res = sj.hybrid_join(points_df(spark, sf_dir))
    path = write_poly_results(res, str(tmp_path), end_time=1341128000, eps=10)
    assert path.endswith("raster_1341128000_10.csv")
    lines = open(path).read().strip().split("\n")
    assert len(lines) == ORACLE_POLYS.n_polys
    # positional by polygon id, tab-separated (main.cpp:195-225)
    for i, line in enumerate(lines):
        pid, val = line.split("\t")
        assert int(pid) == i and int(val) >= 0


def test_write_error_bounds_format(spark, sf_dir, tmp_path):
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    eb = sj.error_bounds(points_df(spark, sf_dir))
    path = write_error_bounds(eb, str(tmp_path), end_time=1341128000, eps=20)
    lines = open(path).read().strip().split("\n")
    assert len(lines) == ORACLE_POLYS.n_polys
    for line in lines:
        parts = line.split("\t")
        assert len(parts) == 5


def test_avg_hi_lo_encoding_parity():
    """The reference encodes float sums as two int accumulators to avoid
    float atomics (polygon.frag:19-25); decode per main.cpp:203-223.
    Verify our exact double avg equals the decoded reference value within
    the encoding's quantization (0.1 per value)."""
    rng = np.random.RandomState(12)
    vals = np.round(rng.uniform(0, 500, 1000), 1)  # fares: 0.1 precision
    hi, lo = encode_sum_hi_lo(vals)
    decoded = decode_avg_hi_lo(int(hi.sum()), int(lo.sum()), len(vals))
    exact = vals.mean()
    assert decoded == pytest.approx(exact, abs=0.05)
    # zero-count guard
    assert np.isnan(decode_avg_hi_lo(0, 0, 0))


def test_mercator_spark_equals_numpy_bitwise(spark):
    rng = np.random.RandomState(42)
    n = 2000
    lat = rng.uniform(20.0, 55.0, n)
    lon = rng.uniform(-130.0, -60.0, n)
    df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n), "lat": lat, "lon": lon})
    )
    keep, x, y = geo2world_cols(F.col("lat"), F.col("lon"))
    got = (
        df.withColumn("keep", keep).withColumn("x", x).withColumn("y", y)
        .filter("keep").select("id", "x", "y").toPandas().set_index("id")
    )
    k_np, x_np, y_np = transform_points_np(lat, lon)
    ids = np.nonzero(k_np)[0]
    assert len(got) == len(ids)
    np.testing.assert_array_equal(got.loc[ids, "x"].to_numpy(), x_np[ids])
    np.testing.assert_array_equal(got.loc[ids, "y"].to_numpy(), y_np[ids])


def test_float32_parity_mode_micro_fixture(spark):
    """dtype=float32 reproduces the reference's storage precision; on the
    micro fixture both precisions agree, and the float32 tables make the
    same interior/boundary decisions the reference's float32 kernels do."""
    from raster_join_spark.fixtures import micro_fixture
    from raster_join_spark.geo.grid import GridSpec

    px, py, polys = micro_fixture()
    df = spark.createDataFrame(
        pd.DataFrame({"url": [f"p{i}" for i in range(5)], "x": px, "y": py})
    )
    grid = GridSpec(4.8, 4.8, 0.05, 0.05, 12, 12)
    sj32 = SpatialJoin(spark, polys, grid, dtype=np.float32)
    got = {r["poly_id"]: r["agg"] for r in sj32.hybrid_join(df).collect()}
    assert got == {0: 2, 1: 3}
    assert sj32.tables.cls_cell.dtype == np.int64
