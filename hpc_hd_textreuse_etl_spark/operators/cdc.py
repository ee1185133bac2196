"""Change-data-capture compaction: latest-by-key and parquet upsert.

The reference's serving loads are full overwrites (``load_table``,
sources/jdbc_sink.py); a 100 TB pipeline also needs the incremental
path — fold a stream of keyed change rows into a current-state
snapshot. Two pieces:

- :func:`latest_by_key` — the pure relational core: keep the last row
  per key under an explicit total order (version columns + tiebreak).
  One hash-partitioned window per key; no Python, no driver state.
  Deletes ride along as a tombstone column and are dropped *after* the
  latest-row pick (a delete must shadow earlier upserts of its key).
- :func:`merge_upsert` — the storage step: read the existing snapshot,
  union the delta, re-pick latest, atomically swap directories via the
  catalog's write-temp-then-rename utilities. Idempotent: replaying a
  delta converges to the same snapshot (the order columns decide, not
  arrival time).

At scale the rewrite cost is bounded by partitioning the snapshot on a
stable key prefix and merging only touched partitions; the helper takes
``partition_cols`` for exactly that layout.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import (
    delete_path,
    path_exists,
    rename_path,
)


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delete_col: str | None = None,
) -> DataFrame:
    """Last row per key under ``ORDER BY order_cols DESC``. The caller
    must make the order a total order per key (append a unique id as the
    final order column); a non-total order would make the winner
    partition-layout-dependent. If ``delete_col`` names a boolean
    tombstone column, keys whose *latest* row is a delete vanish."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    latest = (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_col is not None:
        latest = latest.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(
            delete_col
        )
    return latest


def merge_upsert(
    spark: SparkSession,
    snapshot_path: str,
    delta: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    delete_col: str | None = None,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Fold ``delta`` into the parquet snapshot at ``snapshot_path``
    (created if absent) and return the new snapshot DataFrame.

    Write is temp-dir + atomic rename, so a crashed merge leaves the old
    snapshot intact. The existing snapshot has no tombstone column (they
    are consumed on merge); it is padded with NULLs so the union aligns.
    """
    if path_exists(spark, snapshot_path):
        current = spark.read.parquet(snapshot_path)
        if delete_col is not None and delete_col not in current.columns:
            current = current.withColumn(
                delete_col, F.lit(None).cast(delta.schema[delete_col].dataType)
            )
        merged_in = current.unionByName(delta)
    else:
        merged_in = delta
    merged = latest_by_key(merged_in, key_cols, order_cols, delete_col=delete_col)

    tmp = snapshot_path.rstrip("/") + ".__tmp__"
    delete_path(spark, tmp)
    writer = merged.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    old = snapshot_path.rstrip("/") + ".__old__"
    delete_path(spark, old)
    if path_exists(spark, snapshot_path):
        rename_path(spark, snapshot_path, old)
    rename_path(spark, tmp, snapshot_path)
    delete_path(spark, old)
    return spark.read.parquet(snapshot_path)
