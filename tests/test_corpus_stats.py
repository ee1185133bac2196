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
