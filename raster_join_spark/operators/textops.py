"""Text-analysis operators for a training-data pipeline at corpus scale.

All hot-path logic is native pyspark.sql.functions (JVM, whole-stage
codegen) — no Python anywhere: length/replace/split arithmetic only, so
every operator also has an exact SQL twin for the DuckDB oracle.

Operators (each over the ``documents`` table):
- token_stats:   char/token/unique-token counts per doc
- quality_score: length + punctuation + stopword-ratio heuristic
- lang_id:       marker-substring n-gram heuristic language guess
- fingerprint:   md5 content fingerprint + first-token prefix key
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# substring-occurrence count: (len(s) - len(replace(s, m, ''))) / len(m)
# — exact integer math, identical in Spark and DuckDB.


def occurrences(col: Column, marker: str) -> Column:
    return (
        F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit("")))
    ) / F.lit(len(marker))


def occurrences_sql(expr: str, marker: str) -> str:
    m = marker.replace("'", "''")
    return f"((length({expr}) - length(replace({expr}, '{m}', ''))) / {len(marker)})"


# language marker table: crude but deterministic; the oracle reproduces it
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " a ", " and "],
    "es": [" el ", " la ", " y "],
    "zh": [" de ", " le "],
}


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token accounting (whitespace tokenization), all JVM-side."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )


def token_stats_sql() -> str:
    return """
SELECT doc_id,
       length(text) AS n_chars,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       len(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))) AS n_uniq_tokens
FROM documents
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality heuristic: mean token length + stopword density. Exact
    integer arithmetic then one division -> bit-stable across engines."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    n_tokens = F.size(toks)
    stop_hits = (
        occurrences(F.col("text"), " the ")
        + occurrences(F.col("text"), " a ")
        + occurrences(F.col("text"), " and ")
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        stop_hits.cast("long").alias("stop_hits"),
        (F.length("text").cast("double") / n_tokens).alias("avg_token_len"),
    )


def quality_score_sql() -> str:
    stop = " + ".join(occurrences_sql("text", m) for m in (" the ", " a ", " and "))
    return f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       CAST(floor({stop}) AS BIGINT) AS stop_hits,
       CAST(length(text) AS DOUBLE)
         / len(list_filter(string_split(text, ' '), t -> t <> '')) AS avg_token_len
FROM documents
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-based language guess; ties resolve in (en, es, zh) order,
    zero hits -> 'und'. The oracle reproduces the same CASE chain."""
    return docs.select("doc_id", "lang", lang_pred_col().alias("lang_pred"))


def lang_pred_col() -> Column:
    """The lang_id decision as a reusable predicate column over ``text``
    (same CASE chain as :func:`lang_id`; composition surface for
    pipeline filters)."""
    scores = {
        lang: sum(
            (occurrences(F.col("text"), m) for m in markers[1:]),
            occurrences(F.col("text"), markers[0]),
        )
        for lang, markers in LANG_MARKERS.items()
    }
    en, es, zh = scores["en"], scores["es"], scores["zh"]
    return (
        F.when((en >= es) & (en >= zh) & (en > 0), F.lit("en"))
        .when((es >= zh) & (es > 0), F.lit("es"))
        .when(zh > 0, F.lit("zh"))
        .otherwise(F.lit("und"))
    )


def lang_pred_sql() -> str:
    """DuckDB twin of :func:`lang_pred_col` (a CASE expression)."""

    def score(lang: str) -> str:
        return " + ".join(occurrences_sql("text", m) for m in LANG_MARKERS[lang])

    en, es, zh = score("en"), score("es"), score("zh")
    return (
        f"CASE WHEN ({en}) >= ({es}) AND ({en}) >= ({zh}) AND ({en}) > 0 THEN 'en' "
        f"WHEN ({es}) >= ({zh}) AND ({es}) > 0 THEN 'es' "
        f"WHEN ({zh}) > 0 THEN 'zh' ELSE 'und' END"
    )


def lang_id_sql() -> str:
    def score(lang: str) -> str:
        return " + ".join(occurrences_sql("text", m) for m in LANG_MARKERS[lang])

    en, es, zh = score("en"), score("es"), score("zh")
    return f"""
SELECT doc_id, lang,
  CASE WHEN ({en}) >= ({es}) AND ({en}) >= ({zh}) AND ({en}) > 0 THEN 'en'
       WHEN ({es}) >= ({zh}) AND ({es}) > 0 THEN 'es'
       WHEN ({zh}) > 0 THEN 'zh'
       ELSE 'und' END AS lang_pred
FROM documents
"""


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape GPT-style byte-pair pre-tokenization uses (no backslashes so
# the same pattern text runs on Spark's Java regex and DuckDB's RE2)
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Token counts under the BPE-ish regex pre-tokenizer (JVM-side
    regexp_extract_all) next to plain whitespace counts."""
    toks_ws = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    toks_bpe = F.regexp_extract_all(F.col("text"), F.lit(BPE_PATTERN), 0)
    return docs.select(
        "doc_id",
        F.size(toks_ws).alias("n_ws_tokens"),
        F.size(toks_bpe).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks_bpe)).alias("n_uniq_bpe"),
    )


def token_count_bpe_sql() -> str:
    return f"""
SELECT doc_id,
       len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{BPE_PATTERN}'))) AS n_uniq_bpe
FROM documents
"""


def fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of the text bytes (exact-dup key) plus a
    cheap prefix bucket — the document-fingerprinting primitive."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.substring("text", 1, 16).alias("prefix16"),
    )


def fingerprint_sql() -> str:
    return "SELECT doc_id, md5(text) AS fp, substr(text, 1, 16) AS prefix16 FROM documents"
