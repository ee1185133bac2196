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
    salted_buckets: int | None = None,
) -> DataFrame:
    """Last row per key under ``ORDER BY order_cols DESC``. The caller
    must make the order a total order per key (append a unique id as the
    final order column); a non-total order would make the winner
    partition-layout-dependent. If ``delete_col`` names a boolean
    tombstone column, keys whose *latest* row is a delete vanish.

    ``salted_buckets``: skew escape hatch. The default window puts every
    row of a key in ONE task — a hot key (one entity producing 20% of
    the changelog) becomes a straggler that AQE cannot split (skew-join
    handling covers joins, not windows). With ``salted_buckets=N`` the
    pick runs as a two-phase MAX over ``struct(order_cols…, payload)``
    on (key, salt) then (key) — hot keys spread over N tasks, and
    because the caller already guarantees a total order, the struct max
    picks the identical winner (payload fields are never consulted:
    comparison is decided by the order columns). Requirements the
    salted path enforces: no map-typed columns (structs containing maps
    are not orderable) — and order columns must be non-null, which a
    total order implies."""
    keys = list(key_cols)
    if salted_buckets:
        from hpc_hd_textreuse_etl_spark.functions.skew import with_salt

        payload_cols = [c for c in df.columns if c not in keys]
        for f in df.schema.fields:
            if f.name in payload_cols and "map<" in f.dataType.simpleString():
                raise ValueError(
                    f"salted latest_by_key cannot order map-typed column "
                    f"{f.name!r}; drop it or use the window path"
                )
        packed = F.struct(
            *[F.col(c) for c in order_cols],
            F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        )
        salted = with_salt(df.withColumn("__packed", packed), keys, salted_buckets)
        partial = salted.groupBy(*keys, "__salt").agg(
            F.max("__packed").alias("__packed")
        )
        winner = partial.groupBy(*keys).agg(F.max("__packed").alias("__packed"))
        latest = winner.select(
            *[
                F.col(c) if c in keys else F.col(f"__packed.__payload.{c}").alias(c)
                for c in df.columns
            ]
        )
    else:
        w = Window.partitionBy(*keys).orderBy(
            *[F.col(c).desc() for c in order_cols]
        )
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


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    order_cols: Sequence[str] | None = None,
    end_of_time=None,
) -> DataFrame:
    """Slowly-changing-dimension **Type 2**: fold a keyed change stream
    into validity-interval history rows — the dimension-table twin of
    :func:`latest_by_key` (which keeps only the last state, this keeps
    them all with ``[valid_from, valid_to)`` spans).

    For each key, change rows ordered by ``order_cols`` (default:
    ``(ts_col,)`` — append a unique id to make it total if timestamps
    can collide) become one history row each:

    - ``valid_from``  = the row's ``ts_col``;
    - ``valid_to``    = the NEXT change's ``ts_col`` (``end_of_time`` /
      NULL for the current row) — half-open, so as-of lookups are
      ``valid_from <= t AND (valid_to IS NULL OR t < valid_to)``;
    - ``is_current``  = no later change exists.

    Consecutive rows with identical ``attr_cols`` are collapsed first
    (a "change" that changes nothing must not split an interval — the
    run-length dedup uses a lag comparison, not a distinct, so
    re-appearing earlier values still open new intervals).

    One window per step over the same ``(keys, order)`` partitioning —
    Catalyst plans a single Exchange+Sort reused by the lag-dedup and
    the lead; shuffle ∝ input rows. Joining facts against the result is
    a job for :func:`~hpc_hd_textreuse_etl_spark.operators.temporal.asof_join`
    (on ``valid_from``) or ``interval_join`` (on the spans).
    """
    keys = list(key_cols)
    order = list(order_cols) if order_cols else [ts_col]
    attrs = list(attr_cols)
    w = Window.partitionBy(*keys).orderBy(*order)
    cur = F.struct(*[F.col(c) for c in attrs])
    changed = (
        changes.withColumn("__prev", F.lag(cur).over(w))
        # first row of the key, or any attribute differs from the
        # previous state → opens a new interval
        .where(F.col("__prev").isNull() | (cur != F.col("__prev")))
        .drop("__prev")
    )
    out = changed.select(
        *keys,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())
    if end_of_time is not None:
        out = out.withColumn(
            "valid_to", F.coalesce(F.col("valid_to"), F.lit(end_of_time))
        )
    return out
