"""DataHandler-shaped façade: constraint semantics, coarse window,
strategy equivalence (mirrors the reference's main.cpp query lifecycle)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
from raster_join_spark.operators.spatial_join import SpatialJoin
from raster_join_spark.plans.query import (
    Aggregation,
    ConstraintType,
    QueryConstraint,
    QueryEngine,
)
from raster_join_spark.sources.pages import points_df


@pytest.fixture(scope="module")
def pts(spark, sf_dir):
    return points_df(spark, sf_dir)


def test_constraints_match_manual_filters(spark, pts):
    """The reference's hardcoded constraint set shape (main.cpp:82-118):
    EQ on a categorical + GT/LT on numerics, conjunctive."""
    eng = QueryEngine(spark, pts, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    eng.set_query_constraints(
        [
            QueryConstraint("lang", ConstraintType.EQ, "purchase"),
            QueryConstraint("value_c", ConstraintType.GT, 2000),
            QueryConstraint("value_c", ConstraintType.LT, 15000),
        ]
    )
    got = eng.execute_function("hybrid").orderBy("poly_id").toPandas()

    manual = pts.filter(
        (F.col("lang") == "purchase") & (F.col("value_c") > 2000) & (F.col("value_c") < 15000)
    )
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    exp = sj.hybrid_join(manual).orderBy("poly_id").toPandas()
    assert got["agg"].tolist() == exp["agg"].tolist()


def test_all_exact_strategies_agree(spark, pts):
    eng = QueryEngine(spark, pts, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    res = {
        fn: eng.execute_function(fn).orderBy("poly_id").toPandas()["agg"].tolist()
        for fn in ("index", "hybrid", "cpu")
    }
    assert res["index"] == res["hybrid"] == res["cpu"]


def test_avg_and_sum_aggregations(spark, pts):
    eng = QueryEngine(spark, pts, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    eng.set_aggregation(Aggregation.SUM, "value_c")
    s = eng.execute_function("hybrid").orderBy("poly_id").toPandas()
    eng.set_aggregation(Aggregation.AVG, "value_c")
    a = eng.execute_function("hybrid").orderBy("poly_id").toPandas()
    eng.set_aggregation(Aggregation.COUNT)
    c = eng.execute_function("hybrid").orderBy("poly_id").toPandas()
    nz = c["agg"].to_numpy() > 0
    np.testing.assert_allclose(
        a["agg"].to_numpy()[nz],
        s["agg"].to_numpy()[nz] / c["agg"].to_numpy()[nz],
    )


def test_coarse_window_then_aggregate(spark, pts):
    """executeQuery narrows to the window superset; results over the
    window equal filtering exactly when polygons lie inside it."""
    eng = QueryEngine(spark, pts, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    eng.execute_query(t0="2024-01-01 00:00:00")
    out = eng.execute_function("errorbounds").toPandas()
    assert len(out) == ORACLE_POLYS.n_polys
    assert (out.lo1 <= out.cnt).all() and (out.cnt <= out.hi1).all()


def test_unknown_function_raises(spark, pts):
    eng = QueryEngine(spark, pts, COARSE_GRID).set_polygon_query(ORACLE_POLYS)
    with pytest.raises(ValueError, match="unknown join type"):
        eng.execute_function("gpu")
