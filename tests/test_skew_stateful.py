"""Salted aggregation/join equivalence and the stateful streaming dedup."""

from __future__ import annotations

import contextlib
import datetime

import pyspark.sql.functions as F
import pytest

from hpc_hd_textreuse_etl_spark.functions.skew import salted_aggregate, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'hot' carries 90% of rows
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold).cache()


def test_salted_aggregate_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.total, r.mx)
        for r in skewed.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total, r.mx)
        for r in salted_aggregate(
            skewed, ["k"], {"n": ("count", None), "total": ("sum", "v"), "mx": ("max", "v")},
            buckets=8,
        ).collect()
    }
    assert plain == salted


def test_salted_aggregate_rejects_non_associative(spark, skewed):
    with pytest.raises(ValueError, match="non-associative"):
        salted_aggregate(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", 1), ("c1", 2), ("c2", 3)], "k string, tag int"
    )
    plain = sorted(
        (r.k, r.v, r.tag) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r.k, r.v, r.tag) for r in salted_join(skewed, dim, ["k"], buckets=4).collect()
    )
    assert plain == salted


def test_streaming_dedup_first_occurrence_only(spark, tmp_path):
    from hpc_hd_textreuse_etl_spark.streaming.events import read_event_stream, run_to_memory
    from hpc_hd_textreuse_etl_spark.streaming.stateful import streaming_dedup

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 1, "click", 1.0),
        (1, base + datetime.timedelta(seconds=5), 1, "click", 1.0),   # dup id
        (2, base + datetime.timedelta(seconds=10), 1, "click", 1.0),
        (2, base + datetime.timedelta(seconds=15), 1, "view", 1.0),   # same id, other key
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    path = str(tmp_path / "events")
    df.write.mode("overwrite").parquet(path)
    stream = read_event_stream(spark, path)
    run_to_memory(streaming_dedup(stream), "deduped", output_mode="append")
    got = {(r.event_type, r.event_id) for r in spark.sql("select * from deduped").collect()}
    assert got == {("click", 1), ("click", 2), ("view", 2)}


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """Split an in-order event log into 3 micro-batches (one file per
    batch, maxFilesPerTrigger=1): the latest emitted row per user must
    equal the batch funnel operator's output."""
    from hpc_hd_textreuse_etl_spark.operators.funnel import funnel
    from hpc_hd_textreuse_etl_spark.streaming.stateful import streaming_funnel

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, user, typ):
        return (eid, base + datetime.timedelta(seconds=sec), user, typ, 1.0)

    # user 1 completes across batch boundaries; user 2 stalls at stage 1
    # (its 'click' violates the within bound); user 3 never starts.
    batches = [
        [ev(1, 0, 1, "view"), ev(2, 5, 2, "view"), ev(3, 6, 3, "error")],
        [ev(4, 60, 1, "click"), ev(5, 900, 2, "click")],
        [ev(6, 120, 1, "purchase"), ev(7, 1000, 3, "click")],
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    path = tmp_path / "funnel_events"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(path / f"b{i}"))

    from hpc_hd_textreuse_etl_spark.streaming.events import EVENT_SCHEMA

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(path / "*"))
    )
    out = streaming_funnel(
        stream, ("view", "click", "purchase"), within_seconds=300
    )
    q = (
        out.writeStream.format("memory")
        .queryName("funnel_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    log = spark.sql("select * from funnel_stream").collect()
    assert len(log) >= 3  # at least one progression row per user
    latest = {}
    for r in log:  # progression log: stage only grows per user
        if r.user_id not in latest or r.stage > latest[r.user_id].stage:
            latest[r.user_id] = r

    all_events = [e for b in batches for e in b]
    batch_out = {
        r.user_id: r
        for r in funnel(
            spark.createDataFrame(all_events, schema),
            "user_id", "ts", "event_type",
            ("view", "click", "purchase"), within_seconds=300,
        ).collect()
    }
    assert set(latest) == set(batch_out)
    for uid, got in latest.items():
        want = batch_out[uid]
        assert (got.stage, got.t1, got.t2, got.t3) == (
            want.stage, want.t1, want.t2, want.t3
        ), uid
    # pinned expectations, not just cross-agreement
    assert latest[1].stage == 3 and latest[2].stage == 1 and latest[3].stage == 0


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@contextlib.contextmanager
def _state_store_provider(spark, provider):
    """Config-only provider swap (read at query start from the session
    conf): 'default' leaves the HDFS-backed provider in place, 'rocksdb'
    pins RocksDBStateStoreProvider — the provider a production cluster
    runs, where state lives off-heap and survives executor GC pressure."""
    if provider == "default":
        yield
        return
    before = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, _ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if before is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, before)


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_streaming_funnel_restart_resumes_checkpointed_state(
    spark, tmp_path, provider
):
    """Kill-and-restart soak: run the stateful funnel over two batches,
    stop the query, append two more batches, start a NEW query on the
    same checkpoint + file sink. The checkpointed per-user state must
    resume (steps bound before the restart are not re-emitted or
    rebound; batches processed before the restart are not replayed into
    the sink) and the final state must equal the batch twin over the
    full log. Runs under BOTH state-store providers: the RocksDB leg
    proves the applyInPandasWithState state schema round-trips through
    the off-heap store and its changelog across a restart."""
    from hpc_hd_textreuse_etl_spark.operators.funnel import funnel
    from hpc_hd_textreuse_etl_spark.streaming.events import EVENT_SCHEMA
    from hpc_hd_textreuse_etl_spark.streaming.stateful import streaming_funnel

    base = datetime.datetime(2024, 1, 1)

    def ev(eid, sec, user, typ):
        return (eid, base + datetime.timedelta(seconds=sec), user, typ, 1.0)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = tmp_path / "restart_events"
    sink = str(tmp_path / "restart_sink")
    ckpt = str(tmp_path / "restart_ckpt")

    # run 1: user 1 reaches stage 2, user 2 stage 1
    run1 = [
        [ev(1, 0, 1, "view"), ev(2, 5, 2, "view")],
        [ev(3, 60, 1, "click")],
    ]
    # run 2 (after restart): user 1 completes, user 2 advances
    run2 = [
        [ev(4, 120, 1, "purchase"), ev(5, 130, 2, "click")],
        [ev(6, 200, 2, "purchase")],
    ]

    def write_batches(batches, start):
        for i, rows in enumerate(batches, start=start):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src / f"b{i}"))

    def run_query():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            streaming_funnel(stream, ("view", "click", "purchase"))
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    with _state_store_provider(spark, provider):
        write_batches(run1, 0)
        run_query()
        rows_run1 = spark.read.parquet(sink).collect()
        write_batches(run2, 2)
        run_query()  # fresh query object, same checkpoint: must resume

    log = spark.read.parquet(sink).collect()
    # no replay: run 2 appended only progressions caused by NEW events
    new_rows = [tuple(r) for r in log if tuple(r) not in {tuple(x) for x in rows_run1}]
    assert len(log) == len(rows_run1) + len(new_rows)
    assert all(r[1] >= 2 for r in new_rows)  # only post-restart stages 2/3

    latest = {}
    for r in log:
        if r.user_id not in latest or r.stage > latest[r.user_id].stage:
            latest[r.user_id] = r
    all_events = [e for b in run1 + run2 for e in b]
    batch = {
        r.user_id: r
        for r in funnel(
            spark.createDataFrame(all_events, schema),
            "user_id", "ts", "event_type",
            ("view", "click", "purchase"),
        ).collect()
    }
    assert set(latest) == set(batch)
    for uid, got in latest.items():
        want = batch[uid]
        assert got.stage == want.stage, uid
        for i in range(1, 4):
            assert got[f"t{i}"] == want[f"t{i}"], (uid, i)
    # the restart did NOT rebind pre-restart steps: user 1's t1/t2 in the
    # run-2 completion row equal the run-1 bindings
    t1_run1 = next(r for r in rows_run1 if r.user_id == 1 and r.stage == 2)
    assert latest[1].t1 == t1_run1.t1 and latest[1].t2 == t1_run1.t2


@pytest.mark.parametrize("provider", ["default", "rocksdb"])
def test_streaming_dedup_restart_remembers_seen_ids(spark, tmp_path, provider):
    """State-resume proof for the dedup operator: an id emitted before
    the restart arrives again after it and must NOT be re-emitted."""
    from hpc_hd_textreuse_etl_spark.streaming.events import EVENT_SCHEMA
    from hpc_hd_textreuse_etl_spark.streaming.stateful import streaming_dedup

    base = datetime.datetime(2024, 1, 1)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    src = tmp_path / "dedup_events"
    sink = str(tmp_path / "dedup_sink")
    ckpt = str(tmp_path / "dedup_ckpt")

    def run_query():
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        q = (
            streaming_dedup(stream)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    rows1 = [(1, base, 1, "click", 1.0), (2, base + datetime.timedelta(seconds=5), 1, "click", 1.0)]
    rows2 = [
        (1, base + datetime.timedelta(seconds=30), 1, "click", 1.0),
        (3, base + datetime.timedelta(seconds=35), 1, "click", 1.0),
    ]
    with _state_store_provider(spark, provider):
        spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(str(src / "b0"))
        run_query()
        # after restart: id 1 again (must be suppressed by restored state) + new id 3
        spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(str(src / "b1"))
        run_query()

    got = sorted(r.event_id for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]
