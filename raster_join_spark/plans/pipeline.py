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
    are later resurrected with the same salt).

    EXACT-DUP PRE-COLLAPSE (the production ordering): identical texts
    are grouped by md5 first and only each group's min-id REPRESENTATIVE
    enters shingling/MinHash — on the web's boilerplate-heavy shape this
    is the difference between shingling every copy and shingling each
    distinct text once (measured 12x at 20x duplication). The final
    keep set is provably unchanged for the survivors: a representative
    is its group's min id, so component minima computed over
    representatives equal component minima over all docs; and only
    component minima can survive, so non-representatives never need to
    be relabeled at all. (Bucket-count side effect: collapsing copies
    DEFLATES LSH bucket sizes, so fewer hot buckets get dropped —
    strictly better near-dup recall than running MinHash on the raw
    corpus.)"""
    from raster_join_spark.operators.dedup import connected_components

    filtered = docs.filter(
        (lang_pred_col() == F.lit(lang)) & _quality_pred_col(min_tokens)
    )
    # one aggregate, map-side combined: identical texts collapse within
    # each partition before the (fp, min_id, text) rows shuffle
    reps = (
        filtered.select("doc_id", "text")
        .groupBy(F.md5(F.col("text").cast("binary")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
    )
    pairs = minhash_lsh_pairs(reps, k=k, bands=bands, shingle_w=shingle_w)
    # ONE components run; the keep decision is the predicate
    # cluster_id == doc_id on the representative set (survivors are
    # always representatives), so the plan is: corpus scan -> exact-dup
    # aggregate -> broadcast label join -> filter -> project.
    cc = connected_components(pairs)
    asg = split_assign(
        reps, pairs, test_permille=test_permille, salt=salt, cc=cc
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
    the same filter predicates, exact-dup pre-collapse (md5 grouping to
    min-id representatives), pair SQL (against the reps CTE),
    recursive-CTE components, and salted-hash split rule."""
    from raster_join_spark.operators.dedup import h60_sql

    pairs_sql = minhash_lsh_pairs_sql(
        k=k, bands=bands, shingle_w=shingle_w, table="reps"
    )
    cc = connected_components_sql(pairs_sql)
    h = h60_sql(f"'{salt}:' || CAST(r.doc_id AS VARCHAR)")
    return f"""
WITH filtered AS (
  SELECT * FROM documents
  WHERE ({lang_pred_sql()}) = '{lang}' AND {_quality_pred_sql(min_tokens)}
),
reps AS (
  SELECT min(doc_id) AS doc_id, min(text) AS text
  FROM filtered GROUP BY md5(text)
),
cc AS ({cc})
SELECT r.doc_id,
       CASE WHEN {h} % 1000 < {test_permille} THEN 'test' ELSE 'train' END AS split
FROM reps r LEFT JOIN cc c ON r.doc_id = c.doc_id
WHERE COALESCE(c.cluster_id, r.doc_id) = r.doc_id
"""
