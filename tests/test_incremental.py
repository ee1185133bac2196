"""Incremental aggregate maintenance and time-series gap-filling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.incremental import (
    aggregate_delta,
    incremental_aggregate,
    merge_aggregate_states,
)
from hpc_hd_textreuse_etl_spark.operators.temporal import gapfill_buckets

SPECS = {
    "n": ("count", None),
    "total": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k string, v bigint")


def test_incremental_equals_recompute_for_any_split(spark):
    data = [(f"k{i % 7}", i * 3 % 101) for i in range(300)]
    full = aggregate_delta(_rows(spark, data), ["k"], SPECS)
    for cut in (0, 1, 150, 299, 300):  # incl. empty snapshot / empty delta
        snap = aggregate_delta(_rows(spark, data[:cut]), ["k"], SPECS) if cut else None
        merged = incremental_aggregate(snap, _rows(spark, data[cut:]), ["k"], SPECS)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        ), f"cut={cut}"


def test_merge_keys_on_one_side_pass_through(spark):
    a = aggregate_delta(_rows(spark, [("only_a", 5)]), ["k"], SPECS)
    b = aggregate_delta(_rows(spark, [("only_b", 7)]), ["k"], SPECS)
    out = {r["k"]: r["total"] for r in merge_aggregate_states(a, b, ["k"], SPECS).collect()}
    assert out == {"only_a": 5, "only_b": 7}


def test_merge_is_associative_across_three_days(spark):
    days = [
        [("k", 1), ("k", 2)],
        [("k", 10)],
        [("j", 4), ("k", 5)],
    ]
    left = None
    for d in days:
        left = incremental_aggregate(left, _rows(spark, d), ["k"], SPECS)
    allrows = aggregate_delta(_rows(spark, sum(days, [])), ["k"], SPECS)
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, allrows.collect()))


def test_unsupported_aggregate_rejected(spark):
    with pytest.raises(ValueError, match="unsupported aggregate"):
        aggregate_delta(_rows(spark, [("k", 1)]), ["k"], {"m": ("median", "v")})


# ---------------------------------------------------------------------------
# Gap-filling
# ---------------------------------------------------------------------------


def _ts(spark):
    return spark.createDataFrame(
        [("a", "2024-01-01 00:10:00"), ("a", "2024-01-03 05:00:00"),
         ("b", "2024-01-02 00:00:00")],
        "g string, ts_s string",
    ).select("g", F.col("ts_s").cast("timestamp").alias("ts")).withColumn(
        "bucket", F.date_trunc("day", "ts")
    )


def test_gapfill_emits_explicit_zeros(spark):
    out = gapfill_buckets(
        _ts(spark), "bucket", ["g"],
        {"n": F.count(F.lit(1)).cast("bigint")}, fill={"n": 0},
    )
    rows = {(r["g"], str(r["bucket"])): r["n"] for r in out.collect()}
    # 3-day global span x 2 groups = 6 cells, 3 occupied, 3 zero
    assert len(rows) == 6
    assert rows[("a", "2024-01-02 00:00:00")] == 0
    assert rows[("b", "2024-01-01 00:00:00")] == 0
    assert rows[("a", "2024-01-01 00:00:00")] == 1


def test_gapfill_unfilled_columns_stay_null(spark):
    out = gapfill_buckets(
        _ts(spark), "bucket", ["g"],
        {"n": F.count(F.lit(1)).cast("bigint"), "m": F.max("ts")},
        fill={"n": 0},  # m deliberately not filled
    )
    empty = [r for r in out.collect() if r["n"] == 0]
    assert empty and all(r["m"] is None for r in empty)


def test_gapfill_grid_join_broadcasts(spark):
    plan = (
        gapfill_buckets(
            _ts(spark), "bucket", ["g"],
            {"n": F.count(F.lit(1)).cast("bigint")}, fill={"n": 0},
        )._jdf.queryExecution().executedPlan().toString()
    )
    # the dims-only grid attaches via broadcast, not a shuffled join
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# join_delta / incremental_join — insert-only join IVM. The full
# orders⋈customer maintenance is additionally value-hash-gated vs a
# from-scratch recompute (incremental_join_orders).
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.incremental import (
    incremental_join,
    join_delta,
)


def _ab(spark, a_rows, b_rows):
    a = spark.createDataFrame(a_rows, "k long, av string")
    b = spark.createDataFrame(b_rows, "k long, bv string")
    return a, b


def _jrows(df):
    return sorted(map(tuple, df.collect()))


def test_join_delta_any_split_equals_scratch(spark):
    """For every way of splitting both inputs, old∪delta maintenance
    must equal the from-scratch join."""
    a_rows = [(i % 4, f"a{i}") for i in range(8)]
    b_rows = [(i % 5, f"b{i}") for i in range(10)]
    a, b = _ab(spark, a_rows, b_rows)
    scratch = _jrows(a.join(b, "k"))
    for a_cut in (0, 3, 8):
        for b_cut in (0, 4, 10):
            a_old = spark.createDataFrame(a_rows[:a_cut] or [], "k long, av string")
            a_new = spark.createDataFrame(a_rows[a_cut:] or [], "k long, av string")
            b_old = spark.createDataFrame(b_rows[:b_cut] or [], "k long, bv string")
            b_new = spark.createDataFrame(b_rows[b_cut:] or [], "k long, bv string")
            j_old = a_old.join(b_old, "k")
            got = _jrows(
                incremental_join(j_old, a_old, a_new, b_old, b_new, ["k"])
            )
            assert got == scratch, (a_cut, b_cut)


def test_join_delta_terms_are_disjoint(spark):
    """The three delta terms partition the new rows — no row is emitted
    twice (multiset equality above already implies it; this pins the
    term-level reason)."""
    a, b = _ab(spark, [(1, "ao"), (1, "ad")], [(1, "bo"), (1, "bd")])
    a_old, a_new = a.where("av = 'ao'"), a.where("av = 'ad'")
    b_old, b_new = b.where("bv = 'bo'"), b.where("bv = 'bd'")
    d = join_delta(a_old, a_new, b_old, b_new, ["k"]).collect()
    assert sorted((r.av, r.bv) for r in d) == [
        ("ad", "bd"), ("ad", "bo"), ("ao", "bd"),
    ]  # (ao, bo) belongs to j_old, not the delta


def test_incremental_join_two_rounds_associative(spark):
    """Folding two delta batches sequentially equals folding their
    union once."""
    a_rows = [(i % 3, f"a{i}") for i in range(9)]
    b_rows = [(i % 3, f"b{i}") for i in range(6)]
    A = lambda rows: spark.createDataFrame(rows or [], "k long, av string")
    B = lambda rows: spark.createDataFrame(rows or [], "k long, bv string")
    a0, a1, a2 = a_rows[:3], a_rows[3:6], a_rows[6:]
    b0, b1, b2 = b_rows[:2], b_rows[2:4], b_rows[4:]
    j0 = A(a0).join(B(b0), "k")
    j1 = incremental_join(j0, A(a0), A(a1), B(b0), B(b1), ["k"])
    j2 = incremental_join(j1, A(a0 + a1), A(a2), B(b0 + b1), B(b2), ["k"])
    once = incremental_join(j0, A(a0), A(a1 + a2), B(b0), B(b1 + b2), ["k"])
    assert _jrows(j2) == _jrows(once)


# --- retractions ------------------------------------------------------------

import pytest as _pytest  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.incremental import (  # noqa: E402
    affected_keys,
    incremental_aggregate_with_retractions,
    retractable_aggregate_delta,
)


def test_retractions_match_from_scratch(spark):
    base = [(k, v) for k in range(5) for v in range(k + 1)]
    df = spark.createDataFrame(base, "k int, v int")
    snapshot = df.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"), F.sum("v").alias("s")
    )
    # delete one row of k=2, all rows of k=0; insert two rows of k=9
    delta = spark.createDataFrame(
        [(2, 1, "D"), (0, 0, "D"), (9, 7, "I"), (9, 8, "I")], "k int, v int, op string"
    )
    out = {
        r["k"]: (r["n"], r["s"])
        for r in incremental_aggregate_with_retractions(
            snapshot, delta, ["k"],
            {"n": ("count", None), "s": ("sum", "v")}, count_col="n",
        ).collect()
    }
    want_rows = [r for r in base if not (r == (2, 1) or r[0] == 0)] + [(9, 7), (9, 8)]
    want = {}
    for k, v in want_rows:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert out == want
    assert 0 not in out  # fully-deleted key pruned, not a zero row


def test_retractions_reject_min_max(spark):
    delta = spark.createDataFrame([(1, 2, "D")], "k int, v int, op string")
    with _pytest.raises(ValueError, match="dirty-key"):
        retractable_aggregate_delta(delta, ["k"], {"m": ("min", "v")})


def test_affected_keys_only_deletes(spark):
    delta = spark.createDataFrame(
        [(1, 1, "D"), (1, 2, "D"), (2, 3, "I")], "k int, v int, op string"
    )
    assert {r["k"] for r in affected_keys(delta, ["k"]).collect()} == {1}


def test_repair_non_invertible_min_max(spark):
    from hpc_hd_textreuse_etl_spark.operators.incremental import (
        repair_non_invertible,
    )

    base0 = [(1, 10), (1, 5), (2, 7), (3, 1)]
    df0 = spark.createDataFrame(base0, "k int, v int")
    specs = {"mn": ("min", "v"), "mx": ("max", "v")}
    snapshot = df0.groupBy("k").agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    # delete k=1's max and ALL of k=3; k=2 untouched
    delta = spark.createDataFrame(
        [(1, 10, "D"), (3, 1, "D")], "k int, v int, op string"
    )
    base1 = spark.createDataFrame([(1, 5), (2, 7)], "k int, v int")
    out = {
        r["k"]: (r["mn"], r["mx"])
        for r in repair_non_invertible(
            snapshot, base1, delta, ["k"], specs
        ).collect()
    }
    assert out == {1: (5, 5), 2: (7, 7)}  # k=1 repaired, k=2 clean, k=3 gone
