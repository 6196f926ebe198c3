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


def test_knn_radius_clamp_no_overshoot(spark):
    """Doubling growth must clamp the final step so the exhaustive
    certify-all round at exactly max_radius always runs. Setup forces
    r to double past max_radius (r=10, step=10, max_radius=19): the old
    clamp (checking next_step, incrementing by max(next_step, r))
    overshot and silently dropped uncertified queries. With k > n the
    ONLY way to finish is the exhaustive round."""
    n = 5
    x = np.array([900.0, 910.0, 920.0, 930.0, 940.0])
    y = np.array([900.0, 910.0, 920.0, 930.0, 940.0])
    df = spark.createDataFrame(
        pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "x": x, "y": y})
    )
    grid = GridSpec(0.0, 0.0, 50.0, 50.0, 20, 20)
    got = knn_join(spark, df, grid, [(0, 10.0, 10.0)], k=10, max_radius=19).toPandas()
    # fewer than k points exist: all of them must come back, exactly once
    assert sorted(got["event_id"].tolist()) == list(range(n))
    d2 = (x - 10.0) ** 2 + (y - 10.0) ** 2
    order = np.lexsort((np.arange(n), d2))
    assert got.sort_values("rank")["event_id"].tolist() == order.tolist()


def test_knn_round_collect_is_topk_bounded(spark):
    """The per-round collect must be O(|queries| * k) regardless of
    candidate density: _round_topk reduces in-plan (one row per q_id,
    <= k structs each) with no Window exchange."""
    from raster_join_spark.operators.knn import _round_topk

    rng = np.random.RandomState(3)
    n = 20_000  # dense candidate set: 10k rows per query
    cand = spark.createDataFrame(
        pd.DataFrame(
            {
                "q_id": np.repeat(np.arange(2, dtype=np.int64), n // 2),
                "event_id": np.arange(n, dtype=np.int64),
                "dist2": rng.uniform(0, 1e6, n).round(),
            }
        )
    )
    topk = _round_topk(cand, "event_id", k=7)
    rows = topk.collect()
    assert len(rows) == 2  # one row per query, never per candidate
    assert all(len(r["top"]) == 7 for r in rows)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # struct array-sort ranks by (dist2, id) — verify against numpy
    pdf = cand.toPandas()
    for q in (0, 1):
        sub = pdf[pdf.q_id == q]
        o = np.lexsort((sub["event_id"].to_numpy(), sub["dist2"].to_numpy()))[:7]
        exp = sub["event_id"].to_numpy()[o].tolist()
        got = [t["_id"] for r in rows if r["q_id"] == q for t in r["top"]]
        assert got == exp


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
