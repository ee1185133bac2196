"""Property tests for operators/dsir.py and the log-domain Gumbel
sampler (operators/sampling.py gumbel_topk_sample). The full pipelines
are additionally value-hash-gated against DuckDB via the
dsir_importance_ranking / dsir_resampled_docs contract queries
(tests/test_oracle_parity.py); here we verify the numeric semantics
against an independent pure-Python recomputation and the invariants the
docstrings promise (partition-independence, log-domain safety,
weight-monotone inclusion)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import load_testdata
from hpc_hd_textreuse_etl_spark.operators.dsir import (
    dsir_log_weights,
    hashed_ngram_counts,
)
from hpc_hd_textreuse_etl_spark.operators.sampling import gumbel_topk_sample
from tests.conftest import SF_SMOKE

NUM_BUCKETS = 512


@pytest.fixture(scope="module")
def tables(spark):
    load_testdata(spark, SF_SMOKE)
    return spark


def _portable_h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_grams(text: str) -> list[str]:
    w = text.split()
    return w + [f"{a} {b}" for a, b in zip(w, w[1:])]


def _py_counts(text: str) -> Counter:
    c: Counter = Counter()
    for g in _py_grams(text):
        c[_portable_h(g) % NUM_BUCKETS] += 1
    return c


def test_hashed_ngram_counts_tiny(spark):
    """Exact bucket counts for hand-computable documents, including the
    no-bigram edge cases (empty / one-word text)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, "x x x")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_ngram_counts(
            df, "doc_id", "text", NUM_BUCKETS, hash_family="portable"
        ).collect()
    }
    want = {}
    for doc_id, text in [(1, "a b c"), (2, "solo"), (4, "x x x")]:
        for b, n in _py_counts(text).items():
            want[(doc_id, b)] = n
    assert got == want  # doc 3 (empty) contributes nothing
    # doc 1: 3 unigrams + 2 bigrams; doc 4 collapses "x" and "x x"
    assert sum(n for (d, _), n in got.items() if d == 1) == 5


def test_dsir_log_weights_match_python_reference(tables):
    """The Spark weights equal an independent driver-side recomputation
    of Σ c_b·(ln p_t(b) − ln p_r(b)) to float tolerance (the fold order
    differs from Python's dict order, so exact bit equality is not the
    claim here — the DuckDB gate pins the order-fixed fold)."""
    docs = tables.table("documents")
    target = docs.filter(F.col("lang") == "en")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            docs, target, "doc_id", "text",
            num_buckets=NUM_BUCKETS, hash_family="portable",
        ).collect()
    }

    rows = docs.select("doc_id", "text", "lang").collect()
    per_doc = {r["doc_id"]: _py_counts(r["text"]) for r in rows}
    raw: Counter = Counter()
    tgt: Counter = Counter()
    for r in rows:
        raw.update(per_doc[r["doc_id"]])
        if r["lang"] == "en":
            tgt.update(per_doc[r["doc_id"]])
    n_r, n_t = sum(raw.values()), sum(tgt.values())
    want = {
        d: sum(
            c
            * (
                math.log((tgt.get(b, 0) + 1.0) / (n_t + NUM_BUCKETS))
                - math.log((raw[b] + 1.0) / (n_r + NUM_BUCKETS))
            )
            for b, c in cnts.items()
        )
        for d, cnts in per_doc.items()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9), d


def test_dsir_weights_partition_independent(tables):
    """Order-fixed fold: identical weights (bit-for-bit) under a hostile
    re-layout of the input."""
    docs = tables.table("documents")
    target = docs.filter(F.col("lang") == "en")

    def weights(d):
        return {
            r["doc_id"]: r["log_weight"]
            for r in dsir_log_weights(
                d, target, "doc_id", "text",
                num_buckets=NUM_BUCKETS, hash_family="portable",
            ).collect()
        }

    assert weights(docs) == weights(docs.repartition(37, "lang"))


def test_dsir_xxhash_family_runs(tables):
    """The production hash family produces a weight for every document
    (values differ from portable — different buckets — but the shape
    and coverage contract is the same)."""
    docs = tables.table("documents")
    out = dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
        num_buckets=NUM_BUCKETS, hash_family="xxhash64",
    )
    assert out.count() == docs.count()


def test_dsir_lazy_escape_hatch(tables):
    """use_checkpoints=False: no pins at plan-construction time, same
    weights (the pin is a pure materialization, never a value change)."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        live_checkpoint_count,
    )

    docs = tables.table("documents")
    before = live_checkpoint_count()
    lazy = dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
        num_buckets=NUM_BUCKETS, hash_family="portable",
        use_checkpoints=False,
    )
    assert live_checkpoint_count() == before
    eager = dsir_log_weights(
        docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
        num_buckets=NUM_BUCKETS, hash_family="portable",
    )
    assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, eager.collect()))


def test_gumbel_topk_deterministic_and_log_safe(spark):
    """Partition-independence, and log-domain safety: log weights far
    outside exp() range (±800) must not produce inf/nan priorities."""
    rows = [(i, float(i - 500) * 1.6) for i in range(1000)]  # ±800
    df = spark.createDataFrame(rows, "id long, lw double")
    kept1 = gumbel_topk_sample(df, ["id"], "lw", 25).collect()
    kept2 = gumbel_topk_sample(
        df.repartition(13, "lw"), ["id"], "lw", 25
    ).collect()
    assert sorted(r["id"] for r in kept1) == sorted(r["id"] for r in kept2)
    assert all(math.isfinite(r["gumbel_priority"]) for r in kept1)
    assert len(kept1) == 25


def test_gumbel_topk_weight_monotone_inclusion(spark):
    """An overwhelming log weight is always kept; the Gumbel noise term
    is bounded on a finite hash space so a big enough weight gap cannot
    be flipped."""
    rows = [(i, 0.0) for i in range(200)] + [(999, 1e6)]
    df = spark.createDataFrame(rows, "id long, lw double")
    kept = {r["id"] for r in gumbel_topk_sample(df, ["id"], "lw", 10).collect()}
    assert 999 in kept
    assert len(kept) == 10


def test_gumbel_topk_plans_take_ordered(spark):
    """The resample must stay a TakeOrderedAndProject (per-task heaps),
    never a global sort."""
    df = spark.range(10000).withColumn("lw", F.col("id").cast("double") / 100)
    plan = (
        gumbel_topk_sample(df, ["id"], "lw", 10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_dsir_separate_target_normalization(spark):
    """The normal DSIR deployment: the target is a SEPARATE corpus with
    grams the raw corpus never saw. n_t must be the whole target mass
    (dropping unseen-bucket target counts would shift every weight by
    gram_count × a constant and re-order different-length documents)."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha"), (3, "delta epsilon zeta eta")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(100, "alpha beta"), (101, "totally novel grams here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            corpus, target, "doc_id", "text",
            num_buckets=NUM_BUCKETS, hash_family="portable",
        ).collect()
    }
    rows = corpus.collect()
    per_doc = {r["doc_id"]: _py_counts(r["text"]) for r in rows}
    raw: Counter = Counter()
    for c in per_doc.values():
        raw.update(c)
    tgt: Counter = Counter()
    for r in target.collect():
        tgt.update(_py_counts(r["text"]))
    n_r, n_t = sum(raw.values()), sum(tgt.values())  # FULL target mass
    for d, cnts in per_doc.items():
        want = sum(
            c
            * (
                math.log((tgt.get(b, 0) + 1.0) / (n_t + NUM_BUCKETS))
                - math.log((raw[b] + 1.0) / (n_r + NUM_BUCKETS))
            )
            for b, c in cnts.items()
        )
        assert got[d] == pytest.approx(want, abs=1e-9), d


def test_dsir_covers_empty_documents(spark):
    """A document with no tokens has an empty feature bag — importance
    weight 1, log_weight 0.0 — and must still appear in the output (and
    therefore remain samplable)."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    target = spark.createDataFrame([(9, "alpha")], "doc_id long, text string")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(
            corpus, target, "doc_id", "text",
            num_buckets=NUM_BUCKETS, hash_family="portable",
        ).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[2] == 0.0 and got[3] == 0.0
