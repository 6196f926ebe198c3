"""kNN via cell-ring expansion (J6 generalized, GridIndexF.cpp:177-198)
vs brute-force numpy top-k."""

from __future__ import annotations

import numpy as np
import pandas as pd

from raster_join_spark.geo.grid import GridSpec
from raster_join_spark.operators.knn import knn_join


def test_knn_exact_vs_bruteforce(spark):
    rng = np.random.RandomState(5)
    n = 3000
    x = np.round(rng.uniform(0, 1000, n))
    y = np.round(rng.uniform(0, 1000, n))
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    )
    grid = GridSpec(0.0, 0.0, 50.0, 50.0, 20, 20)
    queries = [(0, 100.0, 100.0), (1, 995.0, 5.0), (2, 500.0, 500.0)]
    k = 7

    got = knn_join(spark, df, grid, queries, k).toPandas()
    assert len(got) == k * len(queries)

    for q, qx, qy in queries:
        d2 = (x - qx) * (x - qx) + (y - qy) * (y - qy)
        order = np.lexsort((np.arange(n), d2))[:k]
        exp_ids = order.tolist()
        sub = got[got.q_id == q].sort_values("rank")
        assert sub["event_id"].tolist() == exp_ids, f"q={q}"
        np.testing.assert_array_equal(sub["dist2"].to_numpy(), d2[order])


def test_knn_query_outside_dense_area(spark):
    """Query in an empty corner: ring must expand several rounds and still
    return exact results."""
    rng = np.random.RandomState(8)
    n = 500
    x = rng.uniform(800, 1000, n).round()
    y = rng.uniform(800, 1000, n).round()
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    )
    grid = GridSpec(0.0, 0.0, 25.0, 25.0, 40, 40)
    got = knn_join(spark, df, grid, [(0, 10.0, 10.0)], 3).toPandas()
    d2 = (x - 10.0) ** 2 + (y - 10.0) ** 2
    exp = np.lexsort((np.arange(n), d2))[:3].tolist()
    assert got.sort_values("rank")["event_id"].tolist() == exp
