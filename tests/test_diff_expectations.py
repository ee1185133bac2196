"""Tests for operators/diff.py and the qc.py expectations framework.
Row-level diff classification and the full audit report are
additionally value-hash-checked via orders_table_diff /
orders_expectations_audit (test_oracle_parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.diff import diff_summary, table_diff
from hpc_hd_textreuse_etl_spark.plans.qc import (
    expect_foreign_key,
    expect_in_range,
    expect_in_set,
    expect_not_null,
    expect_row_count_between,
    expect_unique,
    run_expectations,
)


def _t(spark, rows, schema="k long, a string, b long"):
    return spark.createDataFrame(rows, schema)


def test_diff_all_statuses_and_changed_cols(spark):
    old = _t(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30), (4, "w", 40)])
    new = _t(spark, [(1, "x", 10), (2, "Y", 20), (3, "z", 99), (5, "n", 50)])
    got = {
        r.k: (r.diff_status, r.changed_cols)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {
        1: ("unchanged", ""),
        2: ("changed", "a"),
        3: ("changed", "b"),
        4: ("removed", ""),
        5: ("added", ""),
    }


def test_diff_null_safe_comparison(spark):
    """NULL -> value and value -> NULL are changes; NULL == NULL is not."""
    old = _t(spark, [(1, None, 1), (2, "v", None), (3, None, None)])
    new = _t(spark, [(1, "v", 1), (2, None, None), (3, None, None)])
    got = {
        r.k: (r.diff_status, r.changed_cols)
        for r in table_diff(old, new, ["k"]).collect()
    }
    assert got == {1: ("changed", "a"), 2: ("changed", "a"), 3: ("unchanged", "")}


def test_diff_multi_col_change_sorted_names(spark):
    old = _t(spark, [(1, "x", 10)])
    new = _t(spark, [(1, "y", 11)])
    r = table_diff(old, new, ["k"]).collect()[0]
    assert r.changed_cols == "a,b"  # sorted column order, comma-joined


def test_diff_summary_counts(spark):
    old = _t(spark, [(i, "s", i) for i in range(10)])
    new = _t(spark, [(i, "s", i + (1 if i < 3 else 0)) for i in range(12)])
    summ = {
        (r.diff_status, r.changed_cols): r.n
        for r in diff_summary(table_diff(old, new, ["k"])).collect()
    }
    assert summ == {("changed", "b"): 3, ("unchanged", ""): 7, ("added", ""): 2}


def test_diff_compare_cols_subset_and_validation(spark):
    old = _t(spark, [(1, "x", 10)])
    new = _t(spark, [(1, "x", 99)])
    r = table_diff(old, new, ["k"], compare_cols=["a"]).collect()[0]
    assert r.diff_status == "unchanged"  # b excluded from comparison
    with pytest.raises(ValueError):
        table_diff(old.select("k"), new.select("k"), ["k"])


def test_expectations_pass_fail_metrics(spark):
    df = _t(spark, [(1, "ok", 5), (2, None, 50), (2, "dup", -1)])
    rep = {
        r.expectation: (r.metric, r.passed)
        for r in run_expectations([
            expect_not_null(df, "a"),
            expect_unique(df, ["k"]),
            expect_in_range(df, "b", 0, 10),
            expect_in_set(df, "a", ["ok", "dup"]),
            expect_row_count_between(df, 1, 2),
        ]).collect()
    }
    assert rep["not_null:a"] == (1, False)
    assert rep["unique:k"] == (1, False)       # one excess duplicate row
    assert rep["in_range:b"] == (2, False)     # 50 and -1
    assert rep["in_set:a"] == (0, True)        # NULL is not a domain violation
    assert rep["row_count"] == (3, False)


def test_expectations_on_empty_table(spark):
    df = _t(spark, [], "k long, a string, b long")
    rep = {
        r.expectation: (r.metric, r.passed)
        for r in run_expectations([
            expect_not_null(df, "a"),
            expect_in_range(df, "b", 0, 10),
            expect_row_count_between(df, 0, 5),
        ]).collect()
    }
    assert rep["not_null:a"] == (0, True)
    assert rep["in_range:b"] == (0, True)
    assert rep["row_count"] == (0, True)


def test_foreign_key_orphans(spark):
    child = _t(spark, [(1, "x", 100), (2, "y", 200), (3, "z", None)])
    parent = spark.createDataFrame([(100,)], "pk long")
    rep = expect_foreign_key(child, "b", parent, "pk").collect()[0]
    assert (rep.metric, rep.passed) == (1, False)  # 200 orphaned; NULL ignored
    with pytest.raises(ValueError):
        run_expectations([])


def test_analyze_table_full_profile(spark):
    from hpc_hd_textreuse_etl_spark.plans.qc import analyze_table

    df = _t(spark, [(1, "b", 10), (2, None, 30), (3, "a", 30)])
    prof = {r.column: r for r in analyze_table(df).collect()}
    assert set(prof) == {"k", "a", "b"}
    assert (prof["a"].n_rows, prof["a"].n_nulls, prof["a"].n_distinct) == (3, 1, 2)
    assert (prof["a"].min_value, prof["a"].max_value) == ("a", "b")
    assert (prof["b"].n_distinct, prof["b"].min_value, prof["b"].max_value) == (
        2, "10", "30",
    )
    # single job: explicit column subset prunes the agg
    sub = analyze_table(df, ["k"]).collect()
    assert len(sub) == 1 and sub[0].n_distinct == 3


def test_oov_stats_hand_case(spark):
    from hpc_hd_textreuse_etl_spark.operators.corpus_stats import oov_stats

    docs = spark.createDataFrame(
        [(1, "common common rare1"), (2, "common rare2"), (3, "common")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in oov_stats(docs, "doc_id", "text", min_df=2).collect()}
    # vocab = {common} (df 3); rare1/rare2 have df 1
    assert (got[1].n_tokens, got[1].n_oov) == (3, 1)
    assert (got[2].n_tokens, got[2].n_oov) == (2, 1)
    assert (got[3].n_tokens, got[3].n_oov) == (1, 0)
    assert got[2].oov_rate == pytest.approx(0.5)
