"""Dedup + text-analysis operators vs brute-force / DuckDB oracles."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from raster_join_spark.operators import dedup as D
from raster_join_spark.operators import textops as X


@pytest.fixture(scope="module")
def docs_pdf():
    rng = np.random.RandomState(17)
    vocab = [f"w{i}" for i in range(50)]
    rows = []
    for i in range(80):
        words = [vocab[j] for j in rng.randint(0, 50, size=rng.randint(5, 40))]
        rows.append((i, " ".join(words), "en", "s", len(" ".join(words))))
    # exact dups
    rows.append((80, rows[0][1], "en", "s", rows[0][4]))
    rows.append((81, rows[0][1], "en", "s", rows[0][4]))
    # near dup of doc 1 (90% same words)
    base = rows[1][1].split(" ")
    near = base[: max(len(base) - 2, 1)] + ["zz"]
    rows.append((82, " ".join(near), "en", "s", len(" ".join(near))))
    return pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])


@pytest.fixture(scope="module")
def docs(spark, docs_pdf):
    return spark.createDataFrame(docs_pdf)


def _duck(docs_pdf, sql):
    con = duckdb.connect()
    con.register("documents", docs_pdf)
    return con.sql(sql).df()


def test_exact_dedup(spark, docs, docs_pdf):
    got = D.exact_dedup(docs).toPandas().sort_values("fp", ignore_index=True)
    exp = _duck(docs_pdf, D.exact_dedup_sql()).sort_values("fp", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    g = got[got.dup_cnt > 1]
    assert len(g) == 1 and g.iloc[0]["keep_id"] == 0 and g.iloc[0]["dup_cnt"] == 3


def test_word_jaccard_pairs(spark, docs, docs_pdf):
    got = (
        D.word_jaccard_pairs(docs)
        .toPandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    exp = _duck(docs_pdf, D.word_jaccard_sql()).sort_values(
        ["doc_a", "doc_b"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the exact dups and the near dup must appear
    pairs = set(zip(got.doc_a, got.doc_b))
    assert (0, 80) in pairs and (0, 81) in pairs and (80, 81) in pairs
    assert (1, 82) in pairs


def test_word_jaccard_df_cap_drops_ubiquitous_tokens(spark, docs_pdf):
    """A token present in (almost) every doc must be excluded from the
    self-join when df_cap is exceeded — the quadratic-blowup guard."""
    n = 30
    pdf = pd.DataFrame(
        {
            "doc_id": range(n),
            # 'the' is ubiquitous; w{i} is unique per doc except docs 0/1 share w0
            "text": ["the w0" if i < 2 else f"the w{i}" for i in range(n)],
        }
    )
    docs = spark.createDataFrame(pdf)
    got = D.word_jaccard_pairs(docs, min_inter_x5_ge_union=False, df_cap=10).toPandas()
    pairs = set(zip(got.doc_a, got.doc_b))
    # without the cap every pair would co-occur via 'the' (C(30,2)=435 pairs);
    # with it only the w0-sharing pair survives
    assert pairs == {(0, 1)}
    # cardinalities count only kept tokens
    row = got.iloc[0]
    assert row["inter"] == 1 and row["uni"] == 1
    exp = _duck(pdf, D.word_jaccard_sql(df_cap=10))
    assert set(zip(exp.doc_a, exp.doc_b)) == {(0, 1)}


def test_minhash_lsh_sql_parity(spark, docs, docs_pdf):
    """DuckDB twin reproduces the exact candidate pair set."""
    got = (
        D.minhash_lsh_pairs(docs, k=64, bands=16, shingle_w=2)
        .toPandas()
        .sort_values(["doc_a", "doc_b"], ignore_index=True)
    )
    exp = _duck(docs_pdf, D.minhash_lsh_pairs_sql(k=64, bands=16, shingle_w=2))
    exp = exp.sort_values(["doc_a", "doc_b"], ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_simhash_sql_parity(spark, docs, docs_pdf):
    got = D.simhash(docs).toPandas().sort_values("doc_id", ignore_index=True)
    exp = _duck(docs_pdf, D.simhash_sql()).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_winnow_sql_parity(spark, docs, docs_pdf):
    got = (
        D.winnow_fingerprints(docs, k=5, window=4)
        .toPandas()
        .sort_values(["doc_id", "pos"], ignore_index=True)
    )
    exp = _duck(docs_pdf, D.winnow_fingerprints_sql(k=5, window=4)).sort_values(
        ["doc_id", "pos"], ignore_index=True
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_minhash_lsh_finds_near_dups(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, k=64, bands=16, shingle_w=2).toPandas()
    got = set(zip(pairs.doc_a, pairs.doc_b))
    # exact dups share all shingles -> guaranteed same signature
    assert (0, 80) in got and (0, 81) in got and (80, 81) in got
    # near-dup doc 82 vs 1: J~0.9 on 2-shingles -> found w.h.p. (seeded)
    assert (1, 82) in got


def test_minhash_dedup_survivors(spark, docs):
    survivors = set(D.minhash_dedup(docs, k=64, bands=16, shingle_w=2).toPandas().doc_id)
    assert 0 in survivors and 80 not in survivors and 81 not in survivors
    assert 82 not in survivors  # near-dup of 1
    assert 1 in survivors


def test_simhash_similar_docs_close(spark, docs, docs_pdf):
    sh = simhash = D.simhash(docs).toPandas().set_index("doc_id")["simhash"]

    def hamming(a, b):
        return bin((int(a) ^ int(b)) & ((1 << 64) - 1)).count("1")

    assert hamming(sh[0], sh[80]) == 0  # identical text
    assert hamming(sh[1], sh[82]) <= 12  # near dup
    rng = np.random.RandomState(0)
    rand_pairs = [(int(a), int(b)) for a, b in rng.randint(2, 79, size=(20, 2)) if a != b]
    mean_rand = np.mean([hamming(sh[a], sh[b]) for a, b in rand_pairs])
    assert mean_rand > 12  # unrelated docs are far


def test_token_stats(spark, docs, docs_pdf):
    got = X.token_stats(docs).toPandas().sort_values("doc_id", ignore_index=True)
    exp = _duck(docs_pdf, X.token_stats_sql()).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_quality_and_lang_and_fingerprint(spark, docs, docs_pdf):
    for fn, sql in (
        (X.quality_score, X.quality_score_sql()),
        (X.lang_id, X.lang_id_sql()),
        (X.fingerprint, X.fingerprint_sql()),
    ):
        got = fn(docs).toPandas().sort_values("doc_id", ignore_index=True)
        exp = _duck(docs_pdf, sql).sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_winnow_fingerprints_shared_passages(spark, docs, docs_pdf):
    got = D.winnow_fingerprints(docs, k=5, window=4).toPandas()
    # identical docs share ALL fingerprints
    f0 = set(got[got.doc_id == 0].fp)
    f80 = set(got[got.doc_id == 80].fp)
    assert f0 == f80 and len(f0) > 0
    # near-dup shares most fingerprints with its source
    f1 = set(got[got.doc_id == 1].fp)
    f82 = set(got[got.doc_id == 82].fp)
    assert len(f1 & f82) / max(len(f1 | f82), 1) > 0.5
    # positions in range
    assert (got.pos >= 0).all()


def test_token_count_bpe(spark, docs, docs_pdf):
    got = X.token_count_bpe(docs).toPandas().sort_values("doc_id", ignore_index=True)
    exp = _duck(docs_pdf, X.token_count_bpe_sql()).sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_h60_parity_across_engines(spark):
    """The md5-derived 60-bit hash must agree bit-for-bit between the
    Spark column expression, the DuckDB SQL twin, and the Python kernel
    twin — including unicode and edge strings. This is the foundation
    of every minhash/simhash/winnowing oracle."""
    import duckdb
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.RandomState(99)
    alphabet = list("abc XYZ09_.:/?&=-") + ["é", "ü", "中", "🙂", "'", '"']
    strs = ["", "a", " ", "''", 'x"y'] + [
        "".join(rng.choice(alphabet, size=rng.randint(1, 30)).tolist())
        for _ in range(200)
    ]
    pdf = pd.DataFrame({"i": range(len(strs)), "s": strs})
    got = (
        spark.createDataFrame(pdf)
        .select("i", D.h60_col(F.col("s")).alias("h"))
        .toPandas()
        .sort_values("i", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("t", pdf)
    exp = con.sql(f"SELECT i, {D.h60_sql('s')} AS h FROM t ORDER BY i").df()
    assert got["h"].tolist() == exp["h"].tolist()
    assert got["h"].tolist() == [D.h60_py(s) for s in strs]


def test_winnow_kernel_flat_equals_ref():
    """The flat-batch winnow kernel must reproduce the per-doc loop
    exactly: same hashes, same leftmost-min tie-breaks, same
    consecutive-dedup — across sub-k docs, sub-window docs, tie-heavy
    and non-ASCII text."""
    import numpy as np
    import pandas as pd

    from raster_join_spark.operators.dedup import (
        _winnow_kernel,
        _winnow_kernel_ref,
    )

    rng = np.random.RandomState(7)
    texts = []
    for _ in range(400):
        L = rng.randint(0, 150)
        texts.append("".join(chr(97 + c) for c in rng.randint(0, 5, L)))
    texts[:6] = ["", "ab", "abcd", "abcde", "aaaaaaaaaaaa", "日本語テキスト" * 4]
    ids = np.arange(len(texts), dtype=np.int64)
    for k, w in ((5, 4), (3, 2), (2, 5)):
        a = _winnow_kernel_ref(ids, texts, k, w)
        b = _winnow_kernel(ids, texts, k, w)
        da = pd.DataFrame({"i": a[0], "p": a[1], "f": a[2]}).sort_values(
            ["i", "p", "f"], ignore_index=True
        )
        db = pd.DataFrame({"i": b[0], "p": b[1], "f": b[2]}).sort_values(
            ["i", "p", "f"], ignore_index=True
        )
        pd.testing.assert_frame_equal(da, db)


def test_minhash_hot_bucket_metrics(spark, docs):
    """Round-4 verdict item 6: the opt-in drop counters report how much
    candidacy the hot-bucket guard sacrificed. Exact dups (docs 0/80/81)
    share every band bucket, so max_bucket=2 makes each of their 16 band
    buckets hot (3 > 2): 16 dropped buckets, 3*16 memberships, 3 docs."""
    metrics: dict = {}
    pairs = D.minhash_lsh_pairs(
        docs, k=64, bands=16, shingle_w=2, max_bucket=2, metrics=metrics
    ).toPandas()
    assert metrics["dropped_buckets"] >= 16
    assert metrics["affected_docs"] >= 3
    assert metrics["dropped_memberships"] >= 48
    got = set(zip(pairs.doc_a, pairs.doc_b))
    assert (0, 80) not in got  # the dup trio lost its (only) buckets
    # counters are pure observation: same pair set as a metrics-less run
    base = D.minhash_lsh_pairs(
        docs, k=64, bands=16, shingle_w=2, max_bucket=2
    ).toPandas()
    assert got == set(zip(base.doc_a, base.doc_b))


def _union_find(edges):
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted({n for e in edges for n in e})
    return pd.DataFrame(
        {"doc_id": nodes, "cluster_id": [find(n) for n in nodes]}
    ).astype("int64")


def _cc_df(spark, edges, **kw):
    pairs = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]).astype("int64")
    )
    stats: dict = {}
    got = (
        D.connected_components(pairs, stats=stats, **kw)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
        .astype("int64")
    )
    return got, stats


def test_connected_components_chain_is_log_rounds(spark):
    """A 64-node chain is the propagation worst case: plain min-label
    spreading needs 63 rounds; pointer jumping must close it in
    O(log n) — the property that makes CC usable on web-scale dup
    chains."""
    edges = [(i, i + 1) for i in range(64)]
    got, stats = _cc_df(spark, edges)
    assert (got["cluster_id"] == 0).all() and len(got) == 65
    assert stats["rounds"] <= 10


def test_connected_components_random_graph_matches_union_find(spark):
    rng = np.random.default_rng(7)
    edges = [
        (int(a), int(b))
        for a, b in rng.integers(0, 120, size=(90, 2))
        if a != b
    ]
    got, _ = _cc_df(spark, edges)
    assert got.equals(_union_find(edges).sort_values("doc_id", ignore_index=True))


def test_connected_components_empty_and_selfcontained(spark):
    got, stats = _cc_df(spark, [(5, 9)])
    assert got.to_dict("list") == {"doc_id": [5, 9], "cluster_id": [5, 5]}
    assert stats["rounds"] >= 1


def test_dedup_canonical_exact_vs_single_pass(spark, docs):
    """dedup_canonical keeps exactly one doc per transitive component;
    on a path A-B, B-C the single-pass rule (drop every doc_b) would
    keep only A out of {A,B,C} dropping C's witnessed-by-B membership
    correctly — but on pair sets where the min doc only appears as
    doc_b of a larger id it diverges. Pin the exact semantics against
    a union-find-derived keep set on the real fixture pairs."""
    pairs = D.minhash_lsh_pairs(docs, k=64, bands=16, shingle_w=2)
    keep = set(
        D.dedup_canonical(docs, pairs).toPandas()["doc_id"].astype(int)
    )
    pp = pairs.toPandas()
    uf = _union_find(list(zip(pp.doc_a.astype(int), pp.doc_b.astype(int))))
    drop = set(uf[uf.cluster_id != uf.doc_id].doc_id)
    all_ids = set(docs.select("doc_id").toPandas()["doc_id"].astype(int))
    assert keep == all_ids - drop


def test_hash_sample_deterministic_and_nested(spark, docs):
    from raster_join_spark.operators import sampling as S

    s1 = set(S.hash_sample(docs, "doc_id", 100).toPandas().doc_id)
    s2 = set(S.hash_sample(docs, "doc_id", 100).toPandas().doc_id)
    assert s1 == s2  # rerun-stable
    s_small = set(S.hash_sample(docs, "doc_id", 50).toPandas().doc_id)
    assert s_small <= s1  # nested rates nest under the same salt
    other = set(S.hash_sample(docs, "doc_id", 100, salt="other").toPandas().doc_id)
    assert other != s1  # different salt = independent sample


def test_split_assign_no_leakage_across_pairs(spark, docs):
    """THE property: no dup pair may straddle the split — each
    component moves as one unit because the CLUSTER id is hashed."""
    from raster_join_spark.operators import sampling as S

    pairs = D.minhash_lsh_pairs(docs, k=64, bands=16, shingle_w=2)
    asg = S.split_assign(docs, pairs, test_permille=300).toPandas()
    side = dict(zip(asg.doc_id, asg.split))
    pp = pairs.toPandas()
    for a, b in zip(pp.doc_a, pp.doc_b):
        assert side[a] == side[b], (a, b)
    # both sides non-empty at 300 permille on 500 docs
    assert {"train", "test"} == set(asg.split)
    # every doc assigned exactly once
    assert len(asg) == docs.count() and asg.doc_id.is_unique


def test_prepare_corpus_composition(spark, sf_dir):
    """Composed pipeline == composed oracle on the real documents
    table, and the composition invariants hold: output subset of the
    filtered survivors, one doc per dup cluster, deterministic."""
    from raster_join_spark.plans.pipeline import prepare_corpus, prepare_corpus_sql

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = (
        prepare_corpus(docs, test_permille=200)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    exp = (
        con.sql(prepare_corpus_sql(test_permille=200))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    got["doc_id"] = got["doc_id"].astype("int64")
    exp["doc_id"] = exp["doc_id"].astype("int64")
    assert got.equals(exp)
    assert 0 < len(got) < docs.count()
    assert got.doc_id.is_unique


def test_connected_components_empty_pairs_converges_fast(spark):
    """Zero pairs (clean corpus) must converge after ONE round, not
    burn max_iters rounds of empty-frame Spark jobs: the NULL label sum
    IS the fixpoint signal for an empty label table."""
    pairs = spark.createDataFrame([], "doc_a LONG, doc_b LONG")
    stats: dict = {}
    got = D.connected_components(pairs, stats=stats).toPandas()
    assert len(got) == 0
    assert stats["rounds"] == 1 and stats["converged"] is True


def test_connected_components_releases_superseded_checkpoints(spark):
    """Each round's localCheckpoint must free the previous round's
    blocks: executors hold ONE label snapshot, not O(log diameter) of
    them (a multi-round chain would otherwise accumulate a checkpoint
    block set per round)."""
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    edges = [(i, i + 1) for i in range(64)]  # forces several rounds
    pairs = spark.createDataFrame(
        pd.DataFrame({"doc_a": [a for a, _ in edges],
                      "doc_b": [b for _, b in edges]})
    )
    stats: dict = {}
    labels = D.connected_components(pairs, stats=stats)
    assert stats["rounds"] >= 3
    after = jsc.getPersistentRDDs().size()
    # only the FINAL labels checkpoint may remain (edges are unpersisted)
    assert after - before <= 1, (
        f"{after - before} persistent RDDs leaked over {stats['rounds']} rounds"
    )
    # and the surviving frame is the live one
    assert labels.count() == 65
