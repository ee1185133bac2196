"""Invariant tests for operators/chunking.py and the mixture-sampling
additions to operators/sampling.py. The exact chunk boundaries and the
exact copy multiset are additionally value-hash-checked against DuckDB
via the doc_token_chunks / mixture_sampled_docs contract queries
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import load_testdata
from hpc_hd_textreuse_etl_spark.operators.chunking import chunk_documents
from hpc_hd_textreuse_etl_spark.operators.sampling import (
    mixture_sample,
    temperature_rates,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def tables(spark):
    load_testdata(spark, SF_SMOKE)
    return spark


def _doc_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


def test_chunk_exact_windows(spark):
    """Hand-computed: 9 tokens, chunk 4, overlap 2 (stride 2) → starts
    0,2,4,6 (start 8 suppressed: 8+2 >= 9 would add no fresh token —
    wait, 8+2=10 > 9 so suppressed by upper bound 9-2-1=6)."""
    toks = "a b c d e f g h i"
    out = chunk_documents(
        _doc_df(spark, [toks]), "doc_id", "text", 4, 2
    ).orderBy("chunk_id").collect()
    assert [(r.chunk_id, r.chunk_text) for r in out] == [
        (0, "a b c d"),
        (1, "c d e f"),
        (2, "e f g h"),
        (3, "g h i"),
    ]
    assert [r.n_tokens for r in out] == [4, 4, 4, 3]


def test_chunk_no_overlap_partitions_tokens(spark):
    """overlap=0: chunks tile the document exactly — concatenation
    reconstructs it, token counts sum to the total."""
    text = " ".join(f"t{i}" for i in range(23))
    out = (
        chunk_documents(_doc_df(spark, [text]), "doc_id", "text", 5, 0)
        .orderBy("chunk_id")
        .collect()
    )
    assert " ".join(r.chunk_text for r in out) == text
    assert sum(r.n_tokens for r in out) == 23


def test_chunk_short_and_empty_docs(spark):
    """n <= chunk_tokens → exactly one chunk (the whole doc); zero
    tokens → zero rows (not one empty chunk)."""
    out = chunk_documents(
        _doc_df(spark, ["one two", "", "   "]), "doc_id", "text", 10, 3
    ).collect()
    assert len(out) == 1
    assert (out[0].doc_id, out[0].chunk_id, out[0].chunk_text) == (0, 0, "one two")


def test_chunk_containment_rule(spark):
    """A final window that would consist only of already-seen tokens is
    suppressed: 6 tokens, chunk 4, overlap 2 → starts 0,2 only (start 4
    would cover tokens 5..6, both already in chunk 1)."""
    out = chunk_documents(
        _doc_df(spark, ["a b c d e f"]), "doc_id", "text", 4, 2
    ).collect()
    assert sorted(r.chunk_id for r in out) == [0, 1]
    # every token still covered
    covered = set()
    for r in out:
        covered.update(r.chunk_text.split())
    assert covered == {"a", "b", "c", "d", "e", "f"}


def test_chunk_every_token_covered_corpus(tables):
    """Corpus-wide: sum of fresh (non-overlap) tokens per doc equals the
    doc's token count — no token lost, no chunk redundant."""
    docs = tables.table("documents")
    chunks = chunk_documents(docs, "doc_id", "text", 24, 8)
    fresh = chunks.groupBy("doc_id").agg(
        (F.sum("n_tokens") - F.lit(8) * (F.count(F.lit(1)) - 1)).alias("fresh")
    )
    truth = docs.select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n"),
    )
    bad = fresh.join(truth, "doc_id").where(F.col("fresh") != F.col("n"))
    assert bad.count() == 0


def test_chunk_validation(spark):
    df = _doc_df(spark, ["x"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 0, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", 4, 4)


def test_chunk_plan_no_shuffle(tables):
    """The chunker is a pure per-row Generate — no Exchange anywhere."""
    plan = chunk_documents(
        tables.table("documents"), "doc_id", "text", 24, 8
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_chunk_plan_single_tokenize(tables):
    """Round-11 shape pin: the tokenizer regex lives in exactly ONE
    Project (codegen CSE evaluates it once per document there). The
    non-outer explode used to let Catalyst infer a ``size(starts) > 0``
    filter and push it BELOW that projection — a second full evaluation
    of the tokenizer in an operator with no CSE against the Project —
    so the Generate must be outer with the cheap null-start filter
    sitting ABOVE it, and when chunk_text is dropped by the consumer
    the token array itself must be pruned off the Generate."""
    df = chunk_documents(
        tables.table("documents"), "doc_id", "text", 24, 8
    ).select("doc_id", "chunk_id", "n_tokens")  # chunk_text pruned
    plan = df._jdf.queryExecution().executedPlan().toString()
    # structural pins (round-12, per ADVICE: anchor on node-level facts
    # rather than codegen-formatting prefixes):
    # 1. the tokenizer expression evaluates in exactly ONE operator, a
    #    Project — the duplicated-evaluation bug planned it in a Filter
    #    AND a Project
    ops_with_regex = [
        seg.split("\n")[0]
        for seg in plan.split("+- ")
        if "regexp_extract_all" in seg.split("\n")[0]
    ]
    assert all("Project" in op for op in ops_with_regex), ops_with_regex
    assert len(ops_with_regex) == 1, ops_with_regex
    # 2. no Filter node references the tokenizer's size() anywhere
    assert not re.search(r"Filter [^\n]*size\(", plan), "inferred size-filter"
    # 3. token array pruned: posexplode child carries counts, not __toks
    assert "__toks" not in plan


# ---------------------------------------------------------------------------
# mixture_sample / temperature_rates
# ---------------------------------------------------------------------------


def test_mixture_integer_rates_exact(tables):
    """Integer rates have no stochastic part: rate 3 → exactly 3 copies
    of every row, rate 0 → none, default 1.0 → passthrough."""
    docs = tables.table("documents").select("doc_id", "source")
    out = mixture_sample(docs, "source", {"src0": 3.0, "src1": 0.0}, ["doc_id"])
    per = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    base = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per["src0"] == 3 * base["src0"]
    assert "src1" not in per
    for src, n in base.items():
        if src not in ("src0", "src1"):
            assert per[src] == n


def test_mixture_fractional_rate_bounds(tables):
    """Rate 2.5: every key group appears 2 or 3 times; the grand total
    sits strictly between the floor and ceil totals."""
    docs = tables.table("documents").select("doc_id", "source")
    out = mixture_sample(docs, "source", {"src0": 2.5}, ["doc_id"])
    counts = (
        out.where(F.col("source") == "src0")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert counts and all(r.n in (2, 3) for r in counts)


def test_mixture_copy_index_and_determinism(tables):
    """copy is 1..n per key group, and the whole multiset is invariant
    under repartitioning (hash gate, not rand())."""
    docs = tables.table("documents").select("doc_id", "source")
    rates = {"src0": 2.5, "src1": 0.3}
    a = mixture_sample(docs, "source", rates, ["doc_id"])
    b = mixture_sample(docs.repartition(17, "source"), "source", rates, ["doc_id"])
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b
    tops = a.groupBy("doc_id").agg(
        F.max("copy").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    assert tops.where(F.col("mx") != F.col("n")).count() == 0


def test_mixture_validation(tables):
    docs = tables.table("documents")
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {"src0": -1.0}, ["doc_id"])
    with pytest.raises(ValueError):
        mixture_sample(docs, "source", {}, ["doc_id"], default_rate=-0.5)


def test_temperature_rates_identity_and_flattening():
    counts = {"big": 900, "small": 100}
    # T=1, default target: reproduce the corpus exactly.
    r1 = temperature_rates(counts, 1.0)
    assert r1 == pytest.approx({"big": 1.0, "small": 1.0})
    # T>1 flattens: tail upsampled, head downsampled, total preserved.
    r2 = temperature_rates(counts, 2.0)
    assert r2["small"] > 1.0 > r2["big"]
    total = sum(r2[k] * counts[k] for k in counts)
    assert total == pytest.approx(1000.0)
    # target_total scales linearly.
    r3 = temperature_rates(counts, 2.0, target_total=2000)
    assert r3["big"] == pytest.approx(2 * r2["big"])
    with pytest.raises(ValueError):
        temperature_rates(counts, 0.0)
    with pytest.raises(ValueError):
        temperature_rates({"x": 0}, 1.0)
