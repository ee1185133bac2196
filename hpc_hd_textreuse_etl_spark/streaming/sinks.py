"""Streaming sinks beyond the built-ins: idempotent parquet append via
``foreachBatch``.

The batch engine materialises snapshots with ``_SUCCESS``-gated
overwrite (catalog.materialise); streams need the incremental twin.
Plain ``writeStream.format("parquet")`` already gives exactly-once for
append — this module covers the case the built-in can't: a sink keyed
by micro-batch that stays correct when a failed batch is REPLAYED.
Replay is not an edge case: after any crash between sink write and
checkpoint commit, the next start re-runs the last batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_stream_idempotent(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start an idempotent parquet sink: each micro-batch overwrites its
    own ``batch_id=N`` subdirectory.

    Idempotence comes from the (batch_id → directory) mapping: a
    replayed batch has the same epoch id, overwrites the same directory,
    and the table converges to the same content — the standard
    foreachBatch recipe for sinks without transactions. Readers use
    :func:`read_idempotent_table` (basePath so the partition column is
    projected out).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_idempotent_table(spark, path: str) -> DataFrame:
    """Read everything the idempotent sink has committed, dropping the
    physical ``batch_id`` partition column."""
    df = spark.read.option("basePath", path).parquet(path)
    return df.drop("batch_id")
