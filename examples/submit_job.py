"""Example cluster job for spark-submit.

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/raster_join_spark.zip \
        examples/submit_job.py <pages_table_dir> <output_dir>

Runs the flagship accurate hybrid spatial aggregation over a web-pages
table and writes per-polygon counts + per-point tile assignments.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    pages_dir, out_dir = sys.argv[1], sys.argv[2]
    spark = SparkSession.builder.appName("raster-join-spark-job").getOrCreate()

    from pyspark.sql import functions as F

    from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
    from raster_join_spark.operators.spatial_join import SpatialJoin

    pages = spark.read.parquet(pages_dir)
    pts = pages.select(
        "url",
        "warc_ts",
        F.regexp_extract("text", "geo:(-?[0-9]+),(-?[0-9]+)", 2)
        .cast("bigint").cast("double").alias("x"),
        F.regexp_extract("text", "geo:(-?[0-9]+),(-?[0-9]+)", 1)
        .cast("bigint").cast("double").alias("y"),
    )
    sj = SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)
    sj.hybrid_join(pts).write.mode("overwrite").parquet(f"{out_dir}/poly_counts")
    sj.assign_polygons(pts).write.mode("overwrite").parquet(f"{out_dir}/tile_assign")


if __name__ == "__main__":
    main()
