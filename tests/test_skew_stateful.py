"""Salted aggregation/join equivalence and the stateful streaming dedup."""

from __future__ import annotations

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
