"""Physical-plan regression tests — the scale guarantees, checked in CI.

These lock in the properties that make the engine viable at 100 TB:
filters reach the parquet scan, projection prunes columns, the polygon
side broadcasts (never a shuffle of the point side), the raster path has
no Python, and the fused hybrid path shuffles only partial vectors.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from raster_join_spark.fixtures import COARSE_GRID, ORACLE_POLYS
from raster_join_spark.operators.spatial_join import SpatialJoin
from raster_join_spark.sources.pages import pages_df, points_df


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def sj(spark):
    return SpatialJoin(spark, ORACLE_POLYS, COARSE_GRID)


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(pages_df(spark, sf_dir).select("url"))
    read = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read and "event_id" in read[0]
    # none of the unused wide columns survive to the scan
    for col in ("props", "value", "user_id", "ts"):
        assert col not in read[0], f"column {col} not pruned: {read[0]}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(points_df(spark, sf_dir).filter(F.col("lang") == "purchase"))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "EqualTo(event_type,purchase)" in pushed[0]


def test_index_join_broadcasts_polygon_side(spark, sf_dir, sj):
    plan = plan_of(sj.index_join(points_df(spark, sf_dir), include_zero=False))
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan, "point side must never shuffle for the join"


def test_raster_join_is_pure_jvm(spark, sf_dir, sj):
    plan = plan_of(sj.raster_join(points_df(spark, sf_dir), include_zero=False))
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
    assert "MapInArrow" not in plan
    assert "SortMergeJoin" not in plan


def test_fused_hybrid_minimal_exchanges(spark, sf_dir, sj):
    plan = plan_of(sj.hybrid_join(points_df(spark, sf_dir), include_zero=False))
    # the fused kernel rides mapInArrow (no pandas copy layer)
    assert "MapInArrow" in plan
    # partial vectors -> exactly one aggregation exchange (plus AQE reads);
    # never a point-wide shuffle
    assert "SortMergeJoin" not in plan
    n_shuffles = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_shuffles <= 1, plan


def test_split_plan_shape(spark, sf_dir, sj):
    """Pin the hierarchical split plan (the fused='auto' default
    accurate path since r7, r7-verdict item 2): every probe/membership
    join is a BroadcastHashJoin (never a SortMergeJoin — a stats
    regression silently shuffling the point side would only show up in
    a bench round otherwise), the Arrow kernel appears exactly once
    (the boundary sink), and the only hash exchanges are the two
    partial-aggregation merges (interior chain + boundary union) plus
    the final per-poly merge — never a point-wide shuffle."""
    plan = plan_of(
        sj.hybrid_join(points_df(spark, sf_dir), fused="auto", include_zero=False)
    )
    assert "SortMergeJoin" not in plan, plan
    assert "ShuffledHashJoin" not in plan, plan
    # 3 chained probe maps + staged boundary semi-joins, all broadcast
    assert plan.count("BroadcastHashJoin") >= 3, plan
    # the boundary-only Arrow kernel, exactly once (count the numbered
    # operator list — formatted explain also names each node in the tree)
    import re

    assert len(re.findall(r"^\(\d+\) MapInArrow", plan, re.M)) == 1, plan
    # aggregation-only exchanges: partial agg merges, bounded by P rows
    # per task — a point-wide exchange would add hashpartitioning over
    # point columns
    n_shuffles = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_shuffles <= 3, plan


def test_simhash_and_minhash_are_pure_jvm(spark):
    """The md5-derived hash family keeps minhash/simhash entirely inside
    whole-stage codegen — no Python operator may appear in their plans."""
    import pandas as pd

    from raster_join_spark.operators.dedup import minhash_lsh_pairs, simhash

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d", "b c d e"]})
    )
    for df in (simhash(docs), minhash_lsh_pairs(docs, k=8, bands=2, shingle_w=2)):
        plan = plan_of(df)
        assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
    # hot-bucket cap must be a broadcast anti-join, never a full-input
    # window shuffle over the (skewed) bucket key
    pair_plan = plan_of(minhash_lsh_pairs(docs, k=8, bands=2, shingle_w=2))
    assert "Window" not in pair_plan, pair_plan
    assert "LeftAnti" in pair_plan, pair_plan


def test_neardup_pairs_pure_jvm(spark):
    import pandas as pd

    from raster_join_spark.operators.similarity import embedding_neardup_pairs

    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": [0, 1], "embedding": [[1.0, 0.0], [0.0, 1.0]]}
        )
    )
    plan = plan_of(embedding_neardup_pairs(emb, n_planes=2, dim=2))
    assert "MapInPandas" not in plan and "FlatMapGroupsInPandas" not in plan
    # bucket cap = broadcast anti-join, no window shuffle on the bucket key
    assert "Window" not in plan, plan
    assert "LeftAnti" in plan, plan


def test_no_row_at_a_time_python_udfs_in_codebase():
    """input_hint: vectorized pandas/Arrow UDFs only. Guard the codebase
    against accidental row-at-a-time F.udf usage."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "raster_join_spark"
    offenders = []
    for py in root.rglob("*.py"):
        src = py.read_text()
        if "F.udf(" in src or "functions.udf(" in src or "@udf" in src:
            offenders.append(str(py))
    assert not offenders, f"row-at-a-time UDFs found: {offenders}"


def test_split_assign_broadcasts_label_table(spark, sf_dir):
    """The corpus->labels join must be a broadcast hash join: the label
    table is checkpoint-backed (no size stats), so without the hint the
    planner SortMergeJoins — i.e. shuffles the whole corpus against a
    table of pair endpoints."""
    from raster_join_spark.operators.dedup import minhash_lsh_pairs
    from raster_join_spark.operators.sampling import split_assign

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, k=64, bands=16, shingle_w=3)
    plan = plan_of(split_assign(docs, pairs, test_permille=200))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan and "Cartesian" not in plan


def test_prepare_corpus_no_doc_sized_join(spark, sf_dir):
    """The composed pipeline's final plan is one corpus scan -> broadcast
    label join -> filter -> project; the keep decision is a predicate on
    the assignment frame, never a doc-sized join against a keep set."""
    from raster_join_spark.plans.pipeline import prepare_corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(prepare_corpus(docs, test_permille=200))
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan and "Cartesian" not in plan
