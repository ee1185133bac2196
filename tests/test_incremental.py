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
