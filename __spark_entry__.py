"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Engine: raster_join_spark — a from-scratch PySpark-native rebuild of
VIDA-NYU/raster-join's spatial-aggregation capabilities (see SURVEY.md §2
for the operator inventory each query exercises).

Oracle-parity design: all spatial queries run over a web-pages table
synthesized deterministically from the ``events`` view by a single SQL
CTE shared verbatim between Spark and DuckDB; coordinates are integer
microdegrees so every engine-side decision (cell ids, PIP, distances) is
reproduced bit-for-bit by generated ANSI SQL (raster_join_spark/oracles).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# query-box fixtures (exact integers in microdegree space)
BOX = (-100_000_000.0, 30_000_000.0, -80_000_000.0, 45_000_000.0)
T0, T1 = "2024-01-02 00:00:00", "2024-01-20 00:00:00"
FILTER_WHERE = "lang = 'purchase' AND value_c > 2000"


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.sources.pages import points_df

    return points_df(spark, sf_dir)


def _sj(spark: SparkSession, grid):
    from raster_join_spark.fixtures import ORACLE_POLYS
    from raster_join_spark.operators.spatial_join import SpatialJoin

    return SpatialJoin(spark, ORACLE_POLYS, grid)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: accurate hybrid spatial join + per-polygon count on the
    sf0.001 web-pages table (J3 semantics, HybridJoin.cpp:339-359)."""
    from raster_join_spark.fixtures import COARSE_GRID

    pts = _points(spark, "/root/testdata/sf0.001")
    return _sj(spark, COARSE_GRID).hybrid_join(pts)


# --------------------------------------------------------------- queries


def _q_index_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    return _sj(spark, COARSE_GRID).index_join(_points(spark, sf_dir))


def _q_hybrid_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    return _sj(spark, COARSE_GRID).hybrid_join(_points(spark, sf_dir))


def _q_hybrid_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID
    from raster_join_spark.operators.spatial_join import AggSpec

    return _sj(spark, COARSE_GRID).hybrid_join(
        _points(spark, sf_dir), AggSpec("avg", "value_c", "agg")
    )


def _q_filter_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 attribute constraints (RasterJoin/main.cpp:82-118 shape) pushed
    into the scan before the join."""
    from raster_join_spark.fixtures import COARSE_GRID

    pts = _points(spark, sf_dir).filter(FILTER_WHERE)
    return _sj(spark, COARSE_GRID).hybrid_join(pts)


def _q_raster_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import FINE_GRID

    return _sj(spark, FINE_GRID).raster_join(_points(spark, sf_dir))


def _q_error_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    eb = _sj(spark, COARSE_GRID).error_bounds(_points(spark, sf_dir))
    return eb.select("poly_id", "cnt", "lo1", "hi1")


def _q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    pts = _points(spark, sf_dir)
    return pts.select(
        "url", COARSE_GRID.cell_id_col(F.col("x"), F.col("y")).alias("cell_id")
    )


def _q_point_poly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    return (
        _sj(spark, COARSE_GRID)
        .assign_polygons(_points(spark, sf_dir))
        .select("url", "poly_id")
    )


def _q_coarse_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID

    sj = _sj(spark, COARSE_GRID)
    return sj.coarse_scan(_points(spark, sf_dir), *BOX).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _q_fullscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    return pts.filter(
        (F.col("x") >= BOX[0])
        & (F.col("y") >= BOX[1])
        & (F.col("x") <= BOX[2])
        & (F.col("y") <= BOX[3])
        & (F.col("warc_ts") >= F.lit(T0).cast("timestamp_ntz"))
        & (F.col("warc_ts") <= F.lit(T1).cast("timestamp_ntz"))
    ).agg(F.count(F.lit(1)).alias("cnt"))


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from raster_join_spark.fixtures import COARSE_GRID, KNN_K, KNN_QUERIES
    from raster_join_spark.operators.knn import knn_join

    out = knn_join(spark, _points(spark, sf_dir), COARSE_GRID, KNN_QUERIES, KNN_K)
    return out.select(
        F.col("q_id").cast("long").alias("q_id"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("dist2").cast("long").alias("dist2"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "spatial_index_count": _q_index_count,
        "spatial_hybrid_count": _q_hybrid_count,
        "spatial_hybrid_avg": _q_hybrid_avg,
        "spatial_filter_count": _q_filter_count,
        "spatial_raster_count": _q_raster_count,
        "spatial_error_bounds": _q_error_bounds,
        "tile_assign": _q_tile_assign,
        "point_poly_assign": _q_point_poly,
        "coarse_scan": _q_coarse_scan,
        "fullscan_filter": _q_fullscan,
        "knn": _q_knn,
    }


def oracle_sql() -> dict[str, str]:
    from raster_join_spark import oracles
    from raster_join_spark.fixtures import COARSE_GRID

    return {
        "spatial_index_count": oracles.index_count_sql(),
        "spatial_hybrid_count": oracles.index_count_sql(),
        "spatial_hybrid_avg": oracles.avg_sql(),
        "spatial_filter_count": oracles.index_count_sql(where=FILTER_WHERE),
        "spatial_raster_count": oracles.raster_count_sql(),
        "spatial_error_bounds": oracles.error_bounds_sql(),
        "tile_assign": oracles.tile_assign_sql(),
        "point_poly_assign": oracles.point_poly_sql(),
        "coarse_scan": oracles.coarse_scan_sql(COARSE_GRID, BOX),
        "fullscan_filter": oracles.fullscan_sql(BOX, T0, T1),
        "knn": oracles.knn_sql(),
    }
