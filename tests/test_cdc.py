"""CDC compaction: latest-by-key semantics and the parquet upsert sink."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import path_exists
from hpc_hd_textreuse_etl_spark.operators.cdc import latest_by_key, merge_upsert


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k string, ver int, payload string, deleted boolean"
    )


def test_latest_by_key_picks_winner_by_total_order(spark):
    df = _changes(
        spark,
        [("a", 1, "old", False), ("a", 3, "new", False), ("b", 2, "only", False)],
    )
    out = {
        r["k"]: r["payload"]
        for r in latest_by_key(df, ["k"], ["ver"]).collect()
    }
    assert out == {"a": "new", "b": "only"}


def test_latest_delete_shadows_earlier_upserts(spark):
    df = _changes(
        spark,
        [("a", 1, "v1", False), ("a", 2, None, True), ("b", 1, "keep", False)],
    )
    out = latest_by_key(df, ["k"], ["ver"], delete_col="deleted").collect()
    assert {r["k"] for r in out} == {"b"}
    assert "deleted" not in latest_by_key(
        df, ["k"], ["ver"], delete_col="deleted"
    ).columns


def test_upsert_after_delete_resurrects_key(spark):
    df = _changes(
        spark,
        [("a", 1, "v1", False), ("a", 2, None, True), ("a", 3, "v3", False)],
    )
    out = latest_by_key(df, ["k"], ["ver"], delete_col="deleted").collect()
    assert [(r["k"], r["payload"]) for r in out] == [("a", "v3")]


def test_salted_latest_matches_window_path(spark):
    """The salted two-phase max-struct pick must return EXACTLY the
    window path's rows on a hot-key changelog (one key with ~50% of
    rows, composite keys, tombstones, hypothetical all-payload ties
    excluded by the unique version column)."""
    import random

    rng = random.Random(7)
    rows = []
    for ver in range(400):
        k = "hot" if rng.random() < 0.5 else f"k{rng.randint(0, 20)}"
        rows.append((k, ver, f"p{ver}", rng.random() < 0.1))
    df = _changes(spark, rows).repartition(8)
    for delete_col in (None, "deleted"):
        plain = latest_by_key(df, ["k"], ["ver"], delete_col=delete_col)
        salted = latest_by_key(
            df, ["k"], ["ver"], delete_col=delete_col, salted_buckets=8
        )
        assert salted.columns == plain.columns
        assert salted.exceptAll(plain).count() == 0
        assert plain.exceptAll(salted).count() == 0


def test_salted_latest_rejects_map_columns(spark):
    import pytest

    df = spark.createDataFrame(
        [("a", 1, {"x": 1})], "k string, ver int, m map<string,int>"
    )
    with pytest.raises(ValueError, match="map"):
        latest_by_key(df, ["k"], ["ver"], salted_buckets=4)


def test_salted_latest_has_no_window_and_two_aggregates(spark):
    """Plan shape: the salted path must contain NO Window operator (the
    whole point) and exactly the two-phase aggregate pair."""
    df = _changes(spark, [("a", 1, "x", False), ("a", 2, "y", False)])
    plan = (
        latest_by_key(df, ["k"], ["ver"], salted_buckets=4)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" not in plan
    assert plan.count("Aggregate") >= 2


def test_latest_deterministic_under_repartition(spark):
    rows = [(f"k{i % 17}", i, f"p{i}", False) for i in range(500)]
    df = _changes(spark, rows)
    a = sorted(map(tuple, latest_by_key(df, ["k"], ["ver"]).collect()))
    b = sorted(
        map(tuple, latest_by_key(df.repartition(23), ["k"], ["ver"]).collect())
    )
    assert a == b


def test_merge_upsert_roundtrip_and_idempotent_replay(spark, tmp_path):
    snap = os.path.join(str(tmp_path), "snapshot")
    d1 = _changes(spark, [("a", 1, "v1", False), ("b", 1, "w1", False)])
    merge_upsert(spark, snap, d1, ["k"], ["ver"], delete_col="deleted")

    d2 = _changes(spark, [("a", 2, "v2", False), ("b", 2, None, True)])
    out1 = {
        r["k"]: (r["ver"], r["payload"])
        for r in merge_upsert(
            spark, snap, d2, ["k"], ["ver"], delete_col="deleted"
        ).collect()
    }
    assert out1 == {"a": (2, "v2")}

    # replaying the same delta converges to the same snapshot
    out2 = {
        r["k"]: (r["ver"], r["payload"])
        for r in merge_upsert(
            spark, snap, d2, ["k"], ["ver"], delete_col="deleted"
        ).collect()
    }
    assert out2 == out1
    assert path_exists(spark, snap)
    assert not path_exists(spark, snap + ".__tmp__")
    assert not path_exists(spark, snap + ".__old__")


def test_merge_upsert_out_of_order_delta_loses(spark, tmp_path):
    """An old change arriving late must NOT overwrite newer state —
    the order columns decide, not arrival time."""
    snap = os.path.join(str(tmp_path), "snapshot")
    merge_upsert(
        spark, snap, _changes(spark, [("a", 5, "v5", False)]), ["k"], ["ver"],
        delete_col="deleted",
    )
    out = {
        r["k"]: r["payload"]
        for r in merge_upsert(
            spark, snap, _changes(spark, [("a", 3, "stale", False)]),
            ["k"], ["ver"], delete_col="deleted",
        ).collect()
    }
    assert out == {"a": "v5"}


def test_merge_upsert_partitioned_layout(spark, tmp_path):
    snap = os.path.join(str(tmp_path), "snapshot")
    delta = spark.createDataFrame(
        [("a", 1, "x", "p1"), ("b", 1, "y", "p2")],
        "k string, ver int, payload string, part string",
    )
    merge_upsert(spark, snap, delta, ["k"], ["ver"], partition_cols=["part"])
    assert path_exists(spark, os.path.join(snap, "part=p1"))
    back = spark.read.parquet(snap)
    assert sorted(r["k"] for r in back.collect()) == ["a", "b"]


def test_latest_by_key_single_window_plan(spark):
    """One hash exchange + one window — no extra shuffles sneak in."""
    df = _changes(spark, [("a", 1, "x", False)])
    plan = (
        latest_by_key(df, ["k"], ["ver"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [") == 1
    # rank<=1 is pruned map-side BEFORE the exchange: only one row per
    # key per input partition ever shuffles — the property that makes
    # latest-by-key viable on a 100 TB changelog
    assert "WindowGroupLimit" in plan and ", Partial" in plan


# ---------------------------------------------------------------------------
# Streaming CDC sink
# ---------------------------------------------------------------------------


def test_stream_upsert_folds_changelog_into_snapshot(spark, tmp_path):
    from hpc_hd_textreuse_etl_spark.streaming.sinks import write_stream_upsert

    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    _changes(
        spark,
        [("a", 1, "v1", False), ("b", 1, "w1", False)],
    ).write.parquet(src + "/f1.parquet")
    _changes(
        spark,
        [("a", 2, "v2", False), ("b", 2, None, True), ("c", 1, "x1", False)],
    ).write.parquet(src + "/f2.parquet")

    stream = (
        spark.readStream.schema("k string, ver int, payload string, deleted boolean")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src + "/*")
    )
    q = write_stream_upsert(
        stream, snap, ckpt, ["k"], ["ver"], delete_col="deleted"
    )
    q.awaitTermination(120)
    out = {
        r["k"]: (r["ver"], r["payload"])
        for r in spark.read.parquet(snap).collect()
    }
    assert out == {"a": (2, "v2"), "c": (1, "x1")}


def test_stream_upsert_replay_converges(spark, tmp_path):
    """Re-running from a FRESH checkpoint (worst-case full replay) must
    land on the identical snapshot — the order columns decide, not
    arrival count."""
    from hpc_hd_textreuse_etl_spark.streaming.sinks import write_stream_upsert

    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    _changes(
        spark, [("a", 2, "new", False), ("a", 1, "old", False)]
    ).write.parquet(src + "/f1.parquet")
    schema = "k string, ver int, payload string, deleted boolean"
    for i, ckpt in enumerate(("c1", "c2")):
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        q = write_stream_upsert(
            stream, snap, str(tmp_path / ckpt), ["k"], ["ver"],
            delete_col="deleted",
        )
        q.awaitTermination(120)
        out = [tuple(r) for r in spark.read.parquet(snap).collect()]
        assert out == [("a", 2, "new")], f"run {i}: {out}"


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.cdc import scd2_history  # noqa: E402


def _scd2(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k long, t long, v string, uid long")
    kw.setdefault("key_cols", ["k"])
    kw.setdefault("ts_col", "t")
    kw.setdefault("attr_cols", ["v"])
    kw.setdefault("order_cols", ["t", "uid"])
    return {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, **kw).collect()
    }


def test_scd2_basic_intervals_and_current_flag(spark):
    rows = [(1, 10, "a", 1), (1, 20, "b", 2), (1, 30, "c", 3)]
    assert _scd2(spark, rows) == {
        (1, "a", 10, 20, False),
        (1, "b", 20, 30, False),
        (1, "c", 30, None, True),
    }


def test_scd2_collapses_no_op_changes_but_reopens_reverts(spark):
    # a → a (no-op, collapsed) → b → a (revert REOPENS an interval)
    rows = [(1, 10, "a", 1), (1, 20, "a", 2), (1, 30, "b", 3), (1, 40, "a", 4)]
    assert _scd2(spark, rows) == {
        (1, "a", 10, 30, False),
        (1, "b", 30, 40, False),
        (1, "a", 40, None, True),
    }


def test_scd2_per_key_isolation_and_end_of_time(spark):
    rows = [(1, 10, "a", 1), (2, 5, "x", 2), (2, 7, "y", 3)]
    df = spark.createDataFrame(rows, "k long, t long, v string, uid long")
    got = {
        (r.k, r.v, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(
            df, ["k"], "t", ["v"], ["t", "uid"], end_of_time=999
        ).collect()
    }
    assert got == {
        (1, "a", 10, 999, True),
        (2, "x", 5, 7, False),
        (2, "y", 7, 999, True),
    }


def test_scd2_same_ts_total_order_tiebreak(spark):
    # two changes at the same timestamp: uid decides; later uid wins the
    # open interval, earlier becomes a zero-length span (documented)
    rows = [(1, 10, "a", 1), (1, 10, "b", 2)]
    assert _scd2(spark, rows) == {
        (1, "a", 10, 10, False),
        (1, "b", 10, None, True),
    }


def test_scd2_single_exchange_plan(spark):
    df = spark.createDataFrame(
        [(1, 10, "a", 1), (1, 20, "b", 2)], "k long, t long, v string, uid long"
    )
    plan = (
        scd2_history(df, ["k"], "t", ["v"], ["t", "uid"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_salted_latest_rejects_nested_map_columns(spark):
    """The guard must catch maps NESTED inside arrays/structs too —
    max(struct(...)) fails on any map at any depth, and the top-level
    typeName check used to let these through to an opaque analysis
    error (ADVICE r6)."""
    import pytest

    arr = spark.createDataFrame(
        [("a", 1, [{"x": 1}])], "k string, ver int, am array<map<string,int>>"
    )
    with pytest.raises(ValueError, match="map"):
        latest_by_key(arr, ["k"], ["ver"], salted_buckets=4)
    st = spark.createDataFrame(
        [("a", 1, ({"x": 1},))],
        "k string, ver int, sm struct<inner:map<string,int>>",
    )
    with pytest.raises(ValueError, match="map"):
        latest_by_key(st, ["k"], ["ver"], salted_buckets=4)
