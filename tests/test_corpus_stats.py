"""Corpus-frequency layer (operators/corpus_stats.py): hand-computed
DF/TF semantics and the epsilon check on the ln-based idf weight (the
integer core is hash-gated by queries corpus_vocab_topk / tf_df_exact)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import (
    tf_idf,
    token_doc_frequency,
    vocab_topk,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple"),
        (2, "banana cherry"),
        (3, "apple banana banana date"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_frequency_counts_documents_not_occurrences(spark, corpus):
    dfreq = {r.token: r.df for r in token_doc_frequency(corpus, "doc_id", "text").collect()}
    assert dfreq == {"apple": 2, "banana": 3, "cherry": 1, "date": 1}
    filtered = {r.token for r in
                token_doc_frequency(corpus, "doc_id", "text", min_df=2).collect()}
    assert filtered == {"apple", "banana"}


def test_vocab_topk_order_and_tiebreak(spark, corpus):
    rows = vocab_topk(corpus, "doc_id", "text", k=3).collect()
    assert [(r.token, r.df) for r in rows] == [
        ("banana", 3), ("apple", 2), ("cherry", 1)  # cherry < date at tie
    ]


def test_tf_idf_values(spark, corpus):
    out = {(r.doc_id, r.token): r for r in tf_idf(corpus, "doc_id", "text").collect()}
    assert out[(1, "apple")].tf == 2
    assert out[(3, "banana")].tf == 2
    n = 3
    for (doc, token), r in out.items():
        expect = r.tf * (math.log((n + 1) / (r.df + 1)) + 1.0)
        assert r.tf_idf == pytest.approx(expect, rel=1e-12), (doc, token)
    # a token present in every document still gets positive smooth-idf
    assert out[(2, "banana")].tf_idf > 0


# ---------------------------------------------------------------------------
# cooccurrence_counts (PMI core)
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import (  # noqa: E402
    cooccurrence_counts,
)


def test_cooccurrence_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b a")], "doc_id long, text string"
    )
    got = {
        (r.x, r.y): (r.n_xy, r.n_x, r.n_y)
        for r in cooccurrence_counts(docs, "doc_id", "text", window=2).collect()
    }
    # doc1 pairs (window 2): (a,b),(a,a),(b,a),(b,c),(a,c); doc2: (b,a)
    # symmetric-normalized: ab:3, aa:1, bc:1, ac:1 ; n_a=3, n_b=2, n_c=1
    assert got == {
        ("a", "b"): (3, 3, 2),
        ("a", "a"): (1, 3, 3),
        ("b", "c"): (1, 2, 1),
        ("a", "c"): (1, 3, 1),
    }


def test_cooccurrence_window_one_is_bigrams_and_min_count(spark):
    docs = spark.createDataFrame([(1, "x y x y x")], "doc_id long, text string")
    full = {
        (r.x, r.y): r.n_xy
        for r in cooccurrence_counts(docs, "doc_id", "text", window=1).collect()
    }
    assert full == {("x", "y"): 4}
    filtered = cooccurrence_counts(
        docs, "doc_id", "text", window=1, min_count=5
    ).collect()
    assert filtered == []


def test_cooccurrence_pmi_float_layer(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b a b a b"), (2, "c d c d")], "doc_id long, text string"
    )
    rows = cooccurrence_counts(docs, "doc_id", "text", window=1).collect()
    total_pairs = sum(r.n_xy for r in rows)
    pmi = {
        (r.x, r.y): math.log(r.n_xy * total_pairs / (r.n_x * r.n_y)) for r in rows
    }
    # a-b and c-d always co-occur -> strongly positive PMI
    assert pmi[("a", "b")] > 0 and pmi[("c", "d")] > 0


def test_cooccurrence_no_quadratic_join_on_positions(spark):
    docs = spark.createDataFrame([(1, "a " * 50)], "doc_id long, text string")
    plan = (
        cooccurrence_counts(docs, "doc_id", "text", window=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- bigram LM scoring -----------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import (  # noqa: E402
    bigram_counts,
    bigram_lm_score,
    doc_bigrams,
)


def test_doc_bigrams_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "x"), (3, ""), (4, "p q")],
        "doc_id long, text string",
    )
    got = sorted(
        (r["doc_id"], r["w1"], r["w2"])
        for r in doc_bigrams(docs, "doc_id", "text").collect()
    )
    assert got == [(1, "a", "b"), (1, "b", "c"), (4, "p", "q")]


def test_bigram_counts_and_min_count(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    all_counts = {
        (r["w1"], r["w2"]): r["n_xy"]
        for r in bigram_counts(docs, "doc_id", "text").collect()
    }
    assert all_counts == {("a", "b"): 3, ("b", "a"): 1, ("b", "c"): 1}
    pruned = {
        (r["w1"], r["w2"]): r["n_xy"]
        for r in bigram_counts(docs, "doc_id", "text", min_count=2).collect()
    }
    assert pruned == {("a", "b"): 3}


def test_bigram_lm_integer_core_and_float_layer(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b z q")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_score(docs, "doc_id", "text").collect()}
    # corpus bigrams: (a,b)x2 (b,c)x1 (b,z)x1 (z,q)x1 ; unigrams a2 b2 c1 z1 q1; V=5
    r1 = out[1]
    assert (r1["n_bigrams"], r1["sum_bigram_n"], r1["unseen_bigrams"]) == (2, 3, 0)
    r2 = out[2]
    assert (r2["n_bigrams"], r2["sum_bigram_n"], r2["unseen_bigrams"]) == (3, 4, 0)
    # float layer: add-1 smoothed ln((n_xy+1)/(n_x+V))
    expect1 = (math.log((2 + 1) / (2 + 5)) + math.log((1 + 1) / (2 + 5))) / 2
    assert abs(r1["avg_logprob"] - expect1) < 1e-12
    expect2 = (
        math.log(3 / 7) + math.log(2 / 7) + math.log(2 / 6)
    ) / 3
    assert abs(r2["avg_logprob"] - expect2) < 1e-12


def test_bigram_lm_unseen_and_pruned_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c d")], "doc_id long, text string"
    )
    counts = bigram_counts(docs, "doc_id", "text", min_count=2)  # only (a,b)
    out = {
        r["doc_id"]: r
        for r in bigram_lm_score(docs, "doc_id", "text", counts=counts).collect()
    }
    # doc 2: (a,b) seen (n=3), (b,c) and (c,d) pruned out -> unseen
    r2 = out[2]
    assert (r2["n_bigrams"], r2["sum_bigram_n"], r2["unseen_bigrams"]) == (3, 3, 2)


def test_bigram_lm_plan_no_window_no_cartesian(spark):
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = (
        bigram_lm_score(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # bigrams built in-row, not via windows


# --- chi-square token-label association ------------------------------------

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import (  # noqa: E402
    label_association,
)


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [
        (1, "hola mundo", "es"),
        (2, "hola amigos", "es"),
        (3, "hello world", "en"),
        (4, "hello friends", "en"),
        (5, "hello hola", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_label_association_contingency(spark, labeled):
    out = {
        (r["token"], r["label"]): r
        for r in label_association(labeled, "doc_id", "text", "lang").collect()
    }
    r = out[("hola", "es")]
    assert (r["n11"], r["n_token"], r["n_label"], r["n_docs"]) == (2, 3, 2, 5)
    r = out[("hello", "en")]
    assert (r["n11"], r["n_token"], r["n_label"], r["n_docs"]) == (3, 3, 3, 5)


def test_label_association_chi2_value(spark, labeled):
    out = {
        (r["token"], r["label"]): r["chi2"]
        for r in label_association(labeled, "doc_id", "text", "lang").collect()
    }
    # hello/en: n11=3 n10=0 n01=0 n00=2 -> chi2 = 5*(3*2-0)^2/(3*2*3*2) = 5
    assert abs(out[("hello", "en")] - 5.0) < 1e-12
    # perfectly uninformative cell has chi2 ~ 0 when independent
    # hola/en: n11=1 n10=2 n01=2 n00=0 -> 5*(0-4)^2/(3*2*3*2)=80/36
    assert abs(out[("hola", "en")] - 80.0 / 36.0) < 1e-12


def test_label_association_min_count_prunes(spark, labeled):
    out = label_association(labeled, "doc_id", "text", "lang", min_count=3).collect()
    assert {(r["token"], r["label"]) for r in out} == {("hello", "en")}


def test_label_association_duplicate_tokens_count_docs_once(spark):
    docs = spark.createDataFrame(
        [(1, "x x x", "a"), (2, "x", "b")], "doc_id long, text string, lang string"
    )
    out = {
        (r["token"], r["label"]): r["n11"]
        for r in label_association(docs, "doc_id", "text", "lang").collect()
    }
    assert out[("x", "a")] == 1 and out[("x", "b")] == 1


# --- bm25_topk --------------------------------------------------------------

import math  # noqa: E402

import pytest  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import bm25_topk  # noqa: E402

BM25_DOCS = [
    (1, "spark window merge spark spark"),
    (2, "window window sort"),
    (3, "merge sort key"),
    (4, "the quick fox"),          # no query terms: must not appear
    (5, "spark"),
]


def brute_bm25(terms, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in BM25_DOCS}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s != 0.0:
            scores[d] = s
    return sorted(scores, key=lambda d: (-scores[d], d)), scores


def test_bm25_matches_reference_formula(spark):
    df = spark.createDataFrame(BM25_DOCS, "doc_id int, text string")
    out = bm25_topk(df, "doc_id", "text", ["spark", "merge", "window"], k=10).collect()
    order, scores = brute_bm25(["spark", "merge", "window"])
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == order
    for r in out:
        assert r["score"] == pytest.approx(scores[r["doc_id"]], rel=1e-12)
    assert 4 not in {r["doc_id"] for r in out}


def test_bm25_k_truncates_and_ranks_dense(spark):
    df = spark.createDataFrame(BM25_DOCS, "doc_id int, text string")
    out = bm25_topk(df, "doc_id", "text", ["spark", "window"], k=2).collect()
    assert sorted(r["rank"] for r in out) == [1, 2]


def test_bm25_validates_terms(spark):
    df = spark.createDataFrame(BM25_DOCS, "doc_id int, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [])
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", ["a", "a"])


def test_bm25_plans_take_ordered(spark):
    df = spark.createDataFrame(BM25_DOCS, "doc_id int, text string")
    plan = (
        bm25_topk(df, "doc_id", "text", ["spark"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# --- feature_hash_counts ----------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.corpus_stats import (  # noqa: E402
    feature_hash_counts,
)


def test_feature_hash_counts_conservation_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b"), (3, "")], "doc_id int, text string"
    )
    out = feature_hash_counts(df, "doc_id", "text", n_buckets=8)
    rows = out.collect()
    # total count per doc == token count (no token lost to hashing)
    per_doc = {}
    for r in rows:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n"]
        assert 0 <= r["bucket"] < 8
    assert per_doc == {1: 4, 2: 2}
    # same token -> same bucket in every doc
    again = {(r["doc_id"], r["bucket"]): r["n"] for r in
             feature_hash_counts(df.repartition(5), "doc_id", "text", 8).collect()}
    assert again == {(r["doc_id"], r["bucket"]): r["n"] for r in rows}


def test_feature_hash_no_vocabulary_stage(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id int, text string")
    plan = (
        feature_hash_counts(df, "doc_id", "text", 16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # no join anywhere: the defining contrast with tf_idf's df join
    assert "Join" not in plan


def test_bm25_terms_colliding_with_internal_columns(spark):
    """Query terms named like the operator's internal columns (dl,
    n_docs, total_dl) or containing backticks must not break the pivot
    — tf columns are positional aliases, not raw term strings."""
    docs = [
        (1, "dl dl n_docs"),
        (2, "total_dl dl"),
        (3, "plain words only"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = bm25_topk(df, "doc_id", "text", ["dl", "n_docs", "total_dl"], k=5).collect()
    got = {r["doc_id"] for r in out}
    assert got == {1, 2}
    assert sorted(r["rank"] for r in out) == [1, 2]
    assert all(r["score"] > 0 for r in out)
