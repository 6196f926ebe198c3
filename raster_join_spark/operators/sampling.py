"""Deterministic sampling and leakage-safe train/test splitting.

Training-data pipelines cannot use random sampling: reruns must produce
the same corpus (reproducibility), membership must be decidable from
the ROW alone (no state to join at 100 TB), and near-duplicate documents
must never straddle a train/test boundary (the classic contamination
bug — a test doc whose near-dup sits in train leaks the answer).

Both operators are pure JVM column expressions over the engine's
md5-derived 60-bit hash family (`dedup.h60_col`), which has exact
DuckDB and python twins — so every sampling decision is oracle-gated
bit-for-bit, and re-running on any engine reproduces the same split.

The reference has no sampling surface (it is a query engine); this is
part of the training-pipeline extension the engine targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raster_join_spark.operators.dedup import (
    connected_components,
    connected_components_sql,
    h60_col,
    h60_sql,
)


def hash_sample(
    df: DataFrame,
    key_col: str,
    rate_permille: int,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-mille sample: keep rows whose salted key hash
    lands under the rate. Stateless (each executor decides from the row
    alone — no shuffle, no sample table), stable across reruns and
    engines, and composable: disjoint salts give independent samples,
    nested rates give nested samples (a 10‰ sample is a subset of the
    100‰ sample only if the SAME salt is used — document per use)."""
    assert 0 <= rate_permille <= 1000
    key = F.concat(F.lit(f"{salt}:"), F.col(key_col).cast("string"))
    return df.filter(F.pmod(h60_col(key), F.lit(1000)) < F.lit(rate_permille))


def hash_sample_sql(
    table: str,
    key_col: str,
    rate_permille: int,
    salt: str = "sample",
    select: str = "*",
) -> str:
    """DuckDB twin of :func:`hash_sample`."""
    h = h60_sql(f"'{salt}:' || CAST({key_col} AS VARCHAR)")
    return (
        f"SELECT {select} FROM {table} "
        f"WHERE {h} % 1000 < {rate_permille}"
    )


def split_assign(
    docs: DataFrame,
    pairs: DataFrame,
    test_permille: int = 100,
    id_col: str = "doc_id",
    salt: str = "split",
    cc: DataFrame | None = None,
    broadcast_labels: bool = True,
) -> DataFrame:
    """Leakage-safe train/test assignment: hash the DEDUP CLUSTER, not
    the document, so every near-duplicate component lands wholly on one
    side of the split. Unpaired docs are their own singleton cluster.

    Returns (doc_id, cluster_id, split) with split in {'train','test'}.
    Plan: connected components over the pair list (O(log diameter)
    pointer-jumping rounds), then ONE broadcast-free left join of docs
    to the (small — endpoints only) label table and a stateless hash
    decision per row.

    Pass a precomputed ``cc`` label table (from
    :func:`~raster_join_spark.operators.dedup.connected_components`)
    to share one components run across consumers.

    ``broadcast_labels`` (default on) hints the label table to the
    broadcast side: the table is checkpoint-backed, so the planner has
    no size statistics and would otherwise pick a SortMergeJoin that
    SHUFFLES THE WHOLE CORPUS against a table of pair endpoints.
    Disable only when the endpoint count itself approaches corpus
    scale (dup rate so high the labels exceed broadcast limits) — at
    that point the shuffle join is genuinely required."""
    assert 0 <= test_permille <= 1000
    if cc is None:
        cc = connected_components(pairs)
    cc = cc.withColumnRenamed("doc_id", id_col)
    if broadcast_labels:
        cc = F.broadcast(cc)
    cluster = F.coalesce(F.col("cluster_id"), F.col(id_col))
    key = F.concat(F.lit(f"{salt}:"), cluster.cast("string"))
    return (
        docs.select(id_col)
        .join(cc, id_col, "left")
        .select(
            F.col(id_col),
            cluster.alias("cluster_id"),
            F.when(
                F.pmod(h60_col(key), F.lit(1000)) < F.lit(test_permille),
                F.lit("test"),
            )
            .otherwise(F.lit("train"))
            .alias("split"),
        )
    )


def split_assign_sql(
    pairs_sql: str,
    test_permille: int = 100,
    salt: str = "split",
) -> str:
    """DuckDB twin of :func:`split_assign` over the documents table."""
    cc = connected_components_sql(pairs_sql)
    h = h60_sql(f"'{salt}:' || CAST(COALESCE(c.cluster_id, d.doc_id) AS VARCHAR)")
    return f"""
SELECT d.doc_id,
       COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       CASE WHEN {h} % 1000 < {test_permille} THEN 'test' ELSE 'train' END AS split
FROM documents d LEFT JOIN ({cc}) c ON d.doc_id = c.doc_id
"""
