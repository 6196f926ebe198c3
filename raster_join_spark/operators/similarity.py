"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact top-k by dot product / cosine against a query
  vector. The dot product is an UNROLLED column expression (element
  casts to double, left-fold addition) so the SQL oracle reproduces it
  bit-for-bit; stays entirely JVM-side.
- lsh_topk: random-hyperplane LSH bucketing (signed projections packed
  to a bucket id) + exact re-rank inside the probed buckets — the scale
  path: the exchange carries only bucket-matched candidates. Recall is
  validated against brute force in tests.
- pairwise_topk_join: all-pairs top-k neighbor join between two
  embedding tables via bucketed blocking (used for embedding-cosine
  near-dup detection).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dot_expr(col: str, q: np.ndarray) -> Column:
    """Unrolled dot product: ((e0*q0 + e1*q1) + e2*q2) ... left-fold in
    double — the same IEEE sequence the generated SQL uses."""
    acc: Column | None = None
    for i, qi in enumerate(np.asarray(q, dtype=np.float64)):
        term = F.col(col)[i].cast("double") * F.lit(float(qi))
        acc = term if acc is None else acc + term
    assert acc is not None
    return acc


def dot_sql(col: str, q: np.ndarray) -> str:
    terms = [
        f"CAST({col}[{i + 1}] AS DOUBLE) * {float(qi)!r}"
        for i, qi in enumerate(np.asarray(q, dtype=np.float64))
    ]
    out = terms[0]
    for t in terms[1:]:
        out = f"({out} + {t})"
    return out


def brute_force_topk(
    emb: DataFrame,
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by dot product (descending), id tiebreak. O(N·d) scan,
    fully parallel, no shuffle except the final top-k (a k-row exchange
    thanks to per-partition partial sort via window over one key... we use
    orderBy+limit which Spark executes as TakeOrdered — map-side k rows
    per partition)."""
    scored = emb.select(
        F.col(id_col),
        dot_expr(vec_col, query).alias("score"),
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col(id_col))
        ))
        # quantized score: a 64-term float fold can differ by 1 ulp
        # between engines (codegen fusion), so the comparable output is
        # micro-unit integers
        .select(
            id_col,
            "rank",
            F.floor(F.col("score") * F.lit(1_000_000.0)).cast("long").alias("score_u6"),
        )
    )


def brute_force_topk_sql(query: np.ndarray, k: int = 10) -> str:
    d = dot_sql("embedding", query)
    return f"""
WITH scored AS (SELECT vec_id, {d} AS score FROM embeddings),
ranked AS (
  SELECT vec_id, score,
         row_number() OVER (ORDER BY score DESC, vec_id) AS rnk
  FROM scored
)
SELECT vec_id, CAST(rnk AS BIGINT) AS rank,
       CAST(floor(score * 1000000.0) AS BIGINT) AS score_u6
FROM ranked WHERE rnk <= {k}
"""


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec_col: str, planes: np.ndarray) -> Column:
    """Pack sign bits of hyperplane projections into a bucket id —
    column-expression only (unrolled), no UDF."""
    acc: Column | None = None
    for bit, plane in enumerate(planes):
        proj = dot_expr(vec_col, plane)
        b = F.when(proj >= 0, F.lit(1 << bit)).otherwise(F.lit(0))
        acc = b if acc is None else acc + b
    assert acc is not None
    return acc.cast("long")


def lsh_topk(
    spark: SparkSession,
    emb: DataFrame,
    query: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    n_probes: int = 3,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe the query's bucket plus its ``n_probes-1`` nearest
    Hamming-neighbor buckets (bit flips of the least-confident planes),
    exact re-rank inside. At 10^12 scale the bucket column is a partition
    key: probing touches only matching partitions."""
    dim = len(query)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    proj = planes @ q
    qbits = (proj >= 0).astype(np.int64)
    qbucket = int((qbits << np.arange(n_planes)).sum())
    # multi-probe order: flip subsets of planes ranked by how uncertain
    # (small |projection|) they are — single flips first, then pairs
    conf = np.abs(proj)
    singles = sorted(range(n_planes), key=lambda i: conf[i])
    cands: list[tuple[float, int]] = []
    for i in singles:
        cands.append((conf[i], qbucket ^ (1 << i)))
    for ai in range(n_planes):
        for bi in range(ai + 1, n_planes):
            cands.append((conf[ai] + conf[bi], qbucket ^ (1 << ai) ^ (1 << bi)))
    cands.sort(key=lambda t: t[0])
    probes = [qbucket] + [b for _, b in cands[: max(n_probes - 1, 0)]]
    bucketed = emb.withColumn("bucket", lsh_bucket_col(vec_col, planes))
    cand = bucketed.filter(F.col("bucket").isin(probes))
    scored = cand.select(F.col(id_col), dot_expr(vec_col, q).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col))),
        )
        .select(id_col, "rank", "score")
    )


def _kmeans_np(
    sample: np.ndarray, k: int, iters: int = 10, seed: int = 5
) -> np.ndarray:
    """Tiny deterministic k-means for IVF coarse quantization (driver-side
    over a sample; no MLlib dependency). Returns (k, dim) centroids."""
    rng = np.random.RandomState(seed)
    cent = sample[rng.choice(len(sample), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    return cent


def ivf_assign_col(vec_col: str, centroids: np.ndarray) -> Column:
    """Nearest-centroid id as a column expression: argmin over unrolled
    squared distances — JVM-only, usable as a partition key at scale."""
    best_id: Column = F.lit(0)
    best_d: Column | None = None
    for cid, c in enumerate(centroids):
        # ||v - c||^2 = ||v||^2 - 2 v.c + ||c||^2; rank-equivalent: -2 v.c + ||c||^2
        d = F.lit(float((c * c).sum())) + F.lit(-2.0) * dot_expr(vec_col, c)
        if best_d is None:
            best_d = d
            best_id = F.lit(cid)
        else:
            cond = d < best_d
            best_id = F.when(cond, F.lit(cid)).otherwise(best_id)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_id.cast("long")


def ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    query: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    train_sample: int = 2048,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN — the classic scale path: coarse k-means quantizer assigns
    every vector to an inverted list; a query probes only the n_probe
    nearest lists and re-ranks exactly inside them. At 10^12 scale the
    list id is the table's partition key, so a probe is partition-pruned
    I/O; here the assignment column shows the same plan shape."""
    # deterministic training sample: bare limit() has no ordering guarantee
    sample = np.stack(
        [
            r[0]
            for r in emb.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(train_sample)
            .select(vec_col)
            .collect()
        ]
    ).astype(np.float64)
    cent = _kmeans_np(sample, k=n_lists, seed=seed)
    q = np.asarray(query, dtype=np.float64)
    qd = ((cent - q[None, :]) ** 2).sum(axis=1)
    probes = [int(i) for i in np.argsort(qd)[:n_probe]]
    assigned = emb.withColumn("ivf_list", ivf_assign_col(vec_col, cent))
    cand = assigned.filter(F.col("ivf_list").isin(probes))
    scored = cand.select(F.col(id_col), dot_expr(vec_col, q).alias("score"))
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("score").desc(), F.col(id_col))),
        )
        .select(id_col, "rank", "score")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    n_planes: int = 12,
    seed: int = 11,
    min_cos_x100: int = 95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket blocking then
    exact cosine inside buckets via an Arrow pandas UDF (vectorized
    matmul per bucket group). Returns (id_a, id_b, cos)."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes, seed)
    bucketed = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket_col(vec_col, planes).alias("bucket")
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("cos", T.DoubleType(), False),
        ]
    )
    thresh = min_cos_x100 / 100.0

    def per_bucket(key, pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy(np.int64)
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.sqrt((M * M).sum(axis=1))
        norms[norms == 0] = 1.0
        Mn = M / norms[:, None]
        S = Mn @ Mn.T
        ia, ib = np.nonzero(np.triu(S >= thresh, k=1))
        # canonical id order
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": S[ia, ib]})

    pairs = bucketed.groupBy("bucket").applyInPandas(per_bucket, out_schema)
    return pairs.dropDuplicates(["id_a", "id_b"])
