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


def write_stream_upsert(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols,
    order_cols,
    delete_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming CDC sink: fold each micro-batch of keyed change rows
    into the current-state parquet snapshot (operators/cdc.py
    ``merge_upsert``), the ``foreachBatch`` twin of the batch path.

    Idempotent under batch REPLAY by a stronger mechanism than the
    batch_id-directory sink: the merge itself is convergent — the
    explicit ``order_cols`` total order decides every key, so applying
    the same delta twice (or deltas out of order) lands on the same
    snapshot. Combined with merge_upsert's temp-dir + atomic-rename
    swap, a crash at any point leaves either the old or the new
    snapshot, never a torn one.
    """
    from hpc_hd_textreuse_etl_spark.operators.cdc import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            snapshot_path,
            batch_df,
            key_cols,
            order_cols,
            delete_col=delete_col,
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
