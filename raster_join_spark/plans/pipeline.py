"""End-to-end corpus preparation: filter → dedup → split in ONE plan.

The individual training-data operators (language id, quality scoring,
MinHash dedup, connected components, leakage-safe splitting) are each
oracle-gated in isolation; a real pipeline runs them COMPOSED, and the
composition carries its own correctness hazards — dedup must run over
the FILTERED survivor set (pairs against dropped docs must not resurrect
or drop anything), and the split must hash the post-dedup cluster ids.
``prepare_corpus`` is that composition as one lazy DataFrame: Catalyst
sees the whole lineage, so the language/quality predicates push into the
document scan once and feed both the pair generation and the keep set.

Scale shape: the filters are pure JVM column predicates (stage-fused
with the scan); the only iterative piece is the O(log diameter)
connected-components rounds over the pair list (tiny vs the corpus);
everything else is broadcast anti-joins and stateless hash decisions.

The DuckDB twin composes the SAME stages as nested CTEs over the
identical hash family, so the driver gate checks the whole pipeline
bit-for-bit, not just its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from raster_join_spark.operators.dedup import (
    connected_components_sql,
    minhash_lsh_pairs,
    minhash_lsh_pairs_sql,
)
from raster_join_spark.operators.sampling import split_assign
from raster_join_spark.operators.textops import (
    lang_pred_col,
    lang_pred_sql,
    occurrences,
    occurrences_sql,
)


def _quality_pred_col(min_tokens: int):
    n_tokens = F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
    stop_hits = (
        occurrences(F.col("text"), " the ")
        + occurrences(F.col("text"), " a ")
        + occurrences(F.col("text"), " and ")
    )
    return (n_tokens >= F.lit(min_tokens)) & (stop_hits >= F.lit(1.0))


def _quality_pred_sql(min_tokens: int) -> str:
    stop = " + ".join(
        occurrences_sql("text", m) for m in (" the ", " a ", " and ")
    )
    return (
        f"len(list_filter(string_split(text, ' '), t -> t <> '')) >= {min_tokens} "
        f"AND ({stop}) >= 1.0"
    )


def prepare_corpus(
    docs: DataFrame,
    lang: str = "en",
    min_tokens: int = 5,
    test_permille: int = 100,
    salt: str = "split",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
) -> DataFrame:
    """Filter (language + quality) → MinHash near-dup dedup (exact
    connected components, keep the min-id doc per cluster) → leakage-safe
    train/test assignment. Returns (doc_id, split) for the final corpus.

    Order matters and is pinned by the oracle twin: pairs are generated
    over the FILTERED set (a dropped low-quality doc cannot chain two
    kept docs into one cluster), and the split hashes each survivor's
    cluster id (== its own id post-dedup, but stable if dropped members
    are later resurrected with the same salt)."""
    from raster_join_spark.operators.dedup import connected_components

    filtered = docs.filter(
        (lang_pred_col() == F.lit(lang)) & _quality_pred_col(min_tokens)
    )
    pairs = minhash_lsh_pairs(filtered, k=k, bands=bands, shingle_w=shingle_w)
    # ONE components run feeds both the keep decision and the split —
    # calling dedup_canonical and split_assign separately would run the
    # minhash + CC lineage twice (measured 2x the pipeline wall time).
    # The keep decision IS a predicate on the assignment frame
    # (cluster_id == doc_id keeps exactly the canonical member of each
    # component and every singleton), so the final plan is one corpus
    # scan -> broadcast label join -> filter -> project, with no
    # doc-sized join at the end.
    cc = connected_components(pairs)
    asg = split_assign(
        filtered, pairs, test_permille=test_permille, salt=salt, cc=cc
    )
    return asg.filter(F.col("cluster_id") == F.col("doc_id")).select(
        "doc_id", "split"
    )


def prepare_corpus_sql(
    lang: str = "en",
    min_tokens: int = 5,
    test_permille: int = 100,
    salt: str = "split",
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
) -> str:
    """DuckDB twin of :func:`prepare_corpus` over the documents table —
    the same filter predicates, pair SQL (against the filtered CTE),
    recursive-CTE components, and salted-hash split rule."""
    from raster_join_spark.operators.dedup import h60_sql

    pairs_sql = minhash_lsh_pairs_sql(
        k=k, bands=bands, shingle_w=shingle_w, table="filtered"
    )
    cc = connected_components_sql(pairs_sql)
    h = h60_sql(f"'{salt}:' || CAST(f.doc_id AS VARCHAR)")
    return f"""
WITH filtered AS (
  SELECT * FROM documents
  WHERE ({lang_pred_sql()}) = '{lang}' AND {_quality_pred_sql(min_tokens)}
),
cc AS ({cc})
SELECT f.doc_id,
       CASE WHEN {h} % 1000 < {test_permille} THEN 'test' ELSE 'train' END AS split
FROM filtered f LEFT JOIN cc c ON f.doc_id = c.doc_id
WHERE COALESCE(c.cluster_id, f.doc_id) = f.doc_id
"""
