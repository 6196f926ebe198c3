"""Hierarchical quadkey tiling: numpy/Spark parity, hierarchy properties."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from raster_join_spark.geo.quadkey import (
    parent_key,
    quadkey_col,
    quadkey_np,
    rollup_counts,
    tile_xy_np,
)

BOX = (0.0, 0.0, 1024.0, 1024.0)


def test_quadkey_known_values():
    # zoom 1: four quadrants -> single digit 0..3 (2*by + bx)
    x = np.array([100.0, 900.0, 100.0, 900.0])
    y = np.array([100.0, 100.0, 900.0, 900.0])
    assert quadkey_np(x, y, *BOX, 1).tolist() == ["0", "1", "2", "3"]
    # out of box -> None
    assert quadkey_np(np.array([-1.0]), np.array([5.0]), *BOX, 3).tolist() == [None]


def test_prefix_hierarchy():
    rng = np.random.RandomState(2)
    x = rng.uniform(0, 1024, 500)
    y = rng.uniform(0, 1024, 500)
    k8 = quadkey_np(x, y, *BOX, 8)
    k5 = quadkey_np(x, y, *BOX, 5)
    for a, b in zip(k8, k5):
        assert a.startswith(b)  # parent is a prefix
        assert len(a) == 8 and len(b) == 5


def test_spark_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.uniform(-50, 1100, 1000)
    y = rng.uniform(-50, 1100, 1000)
    df = spark.createDataFrame(pd.DataFrame({"i": np.arange(1000), "x": x, "y": y}))
    got = (
        df.select("i", quadkey_col(F.col("x"), F.col("y"), *BOX, 9).alias("qk"))
        .toPandas()
        .sort_values("i")["qk"]
        .tolist()
    )
    exp = quadkey_np(x, y, *BOX, 9).tolist()
    assert got == exp


def test_rollup_conserves_counts(spark):
    rng = np.random.RandomState(5)
    x = rng.uniform(0, 1024, 2000)
    y = rng.uniform(0, 1024, 2000)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    tiles = (
        df.select(quadkey_col(F.col("x"), F.col("y"), *BOX, 6).alias("qk"))
        .groupBy("qk")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    up = rollup_counts(tiles, "qk", 3).toPandas()
    assert up["cnt"].sum() == 2000
    assert (up["qk"].str.len() == 3).all()
    # parent_key column helper agrees with prefix semantics
    pk = tiles.select(parent_key(F.col("qk")).alias("p"), "qk").toPandas()
    assert all(r.qk.startswith(r.p) for r in pk.itertuples())
