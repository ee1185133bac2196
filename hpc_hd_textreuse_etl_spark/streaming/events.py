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
