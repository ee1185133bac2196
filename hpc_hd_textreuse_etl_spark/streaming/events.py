"""Streaming event analytics: windowed aggregates and sessionization.

The batch engine's gaps-and-islands sessionization (functions/intervals)
has a streaming twin here: ``session_window`` with a watermark. Same
semantics, incremental execution — late events inside the watermark
re-open their session; events later than the watermark are dropped
(documented behavior, not silent).

File-based streams are used for tests (``availableNow`` drains a
directory); production swaps the reader for kafka without touching the
aggregation logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, schema: T.StructType = EVENT_SCHEMA
) -> DataFrame:
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling/sliding event-time counts with late-data handling."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )


def streaming_sessions(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-user sessions via ``session_window`` — the streaming
    equivalent of the batch islands sessionization (user_sessions
    query); state is bounded by the watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append") -> None:
    """Drain all available input synchronously into an in-memory table —
    the local test/drive harness. Note append mode only emits windows the
    watermark has passed; a drained finite input therefore withholds its
    trailing window — use ``complete`` to observe everything."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_active_users(
    events: DataFrame,
    window_days: int = 7,
    watermark: str = "8 days",
) -> DataFrame:
    """Incremental sliding-window distinct users — the streaming twin of
    the batch ``operators/temporal.sliding_distinct_count`` (WAU/DAU),
    with the SAME semantics: distinct users per trailing-N-day report
    day (a user active on 3 days of one window still counts once).

    Structured Streaming rejects DISTINCT aggregates, and a sliding
    ``window()`` + count over deduped user-DAYS counts multi-day users
    once per active day (caught by the batch-equivalence test), so the
    spelling mirrors the batch plan exactly:

    1. project each event onto the ``window_days`` report days it
       covers (in-row ``sequence`` explode — the batch operator's
       bounded fan-out);
    2. declare the REPORT day as the event-time column and
       ``dropDuplicates`` on (user, report_day) — one state row per
       user-day-window membership, expired by the watermark;
    3. a tumbling 1-day window count over the deduped stream — exact
       distinct users per report day, append-mode compatible
       (dedup → time-window aggregation is a supported stateful chain).

    ``watermark`` applies to the report day, which runs up to
    ``window_days - 1`` days AHEAD of the event's own day — size it
    ≥ lateness + window_days to avoid dropping tail memberships."""
    report_days = F.explode(
        F.sequence(
            F.date_trunc("day", F.col("ts")),
            F.date_trunc("day", F.col("ts"))
            + F.expr(f"INTERVAL {window_days - 1} DAYS"),
            F.expr("INTERVAL 1 DAY"),
        )
    )
    deduped = (
        events.select("user_id", report_days.alias("report_day"))
        .withWatermark("report_day", watermark)
        .dropDuplicates(["user_id", "report_day"])
    )
    return (
        deduped.groupBy(F.window("report_day", "1 day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("active_entities"))
        .select(
            F.col("window.start").alias("report_day"),
            "active_entities",
        )
    )
