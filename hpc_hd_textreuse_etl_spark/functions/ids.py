"""Dense, stable integer surrogate-key assignment.

The reference re-keys every string identifier to dense ``1..N`` ids in a
stable sorted order (``etl_textreuse/spark_utils.py:140-230``:
``dfZipWithIndex`` / ``materialise_row_numbers`` /
``materialise_with_int_id``). Ids are contractually dense and sorted —
``monotonically_increasing_id`` is NOT a valid substitute.

Two strategies, picked by expected cardinality:

- ``row_number() OVER (ORDER BY keys)`` — one wide window. Catalyst plans
  a single global sort; the final window runs on one task, fine for
  dimension tables (≤ tens of millions of rows).
- sort + ``rdd.zipWithIndex`` — two jobs (count per partition, then
  label), but every partition is labeled in parallel; this is the scale
  path for fact tables with billions of rows (the reference's
  ``piece_id`` exceeds 2^32, ``database_assets/downstream_clusters.py:18``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
    tracked_local_checkpoint,
)


def zip_with_index(df: DataFrame, id_col: str = "id", offset: int = 1) -> DataFrame:
    """Prepend a dense LongType ordinal preserving current row order.

    JVM-only equivalent of ``rdd.zipWithIndex`` (which in PySpark would
    pickle every row through Python — unusable at fact-table scale):
    ``monotonically_increasing_id`` encodes ``partition_id * 2^33 +
    local_offset`` with consecutive local offsets, so decoding it and
    adding per-partition cumulative counts (a tiny driver collect +
    broadcast join) yields the exact global ordinal. Two scans of the
    input, zero shuffles of the data itself.

    The input MUST be materialized once and read by both passes: the
    count job and the label job are separate Spark jobs, and a lazy
    upstream (sort after distinct, AQE-planned exchanges) is NOT
    partition-stable across job executions — RangePartitioner re-samples
    its boundaries per execution, so rows near a boundary can sit in
    different partitions in the two jobs, which mislabels ordinals
    (duplicates + gaps). This is not theoretical: the round-7 composed
    pipeline hit it at 1.28M defrag targets (~0.8% duplicate ids).
    ``localCheckpoint(eager)`` pins the partitions; it truncates lineage,
    so a lost block fails the job LOUDLY instead of silently recomputing
    a different labeling — the correct failure mode for id assignment.

    The pinned blocks are TRACKED (functions/checkpoints.py): RDD-level
    checkpoint storage is invisible to ``spark.catalog.clearCache()``,
    so after the labeled output is materialized, call
    ``release_local_checkpoints()`` (the registry's per-asset hygiene
    does this) or the copy stays resident for the session.
    """
    tagged = tracked_local_checkpoint(
        df.withColumn("__mono", F.monotonically_increasing_id())
    )
    counts = (
        tagged.groupBy(F.shiftright("__mono", 33).alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    cum: list[tuple[int, int]] = []
    acc = offset
    for row in sorted(counts, key=lambda r: r["__pid"]):
        cum.append((row["__pid"], acc))
        acc += row["__n"]
    offsets = df.sparkSession.createDataFrame(cum, "__pid long, __off long")
    local = F.col("__mono").bitwiseAND(F.lit((1 << 33) - 1))
    out = (
        tagged.withColumn("__pid", F.shiftright("__mono", 33))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(id_col, (F.col("__off") + local).cast("long"))
        .drop("__pid", "__mono", "__off")
    )
    return out.select(id_col, *df.columns)


#: auto-strategy threshold: inputs whose Catalyst size estimate exceeds
#: this go through the parallel zip path; a global single-task window
#: sort is only acceptable for dimension-sized data
WINDOW_MAX_BYTES = 256 << 20


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for the optimized plan (bytes), or None
    if it can't be read. File sources propagate real sizes through
    filters/projections; plans with no statistics report Long.MaxValue —
    which the auto-strategy treats as 'too big', the scale-safe
    direction."""
    try:
        return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))
    except Exception:
        return None


def dense_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "id",
    use_window: bool | None = None,
    window_max_bytes: int = WINDOW_MAX_BYTES,
) -> DataFrame:
    """Assign dense ids 1..N ordered by ``order_by`` over the given rows.

    ``use_window=None`` auto-picks from Catalyst's plan-size estimate
    (:func:`plan_size_bytes`): window only when the input is provably
    dimension-sized (estimate ≤ ``window_max_bytes``), the parallel
    sorted-zipWithIndex path otherwise — including when no estimate
    exists, so "unknown" can never silently become a single-task global
    window over a fact table. Both paths produce identical ids
    (strategy-agreement tested); the knob is purely physical.
    """
    if use_window is None:
        size = plan_size_bytes(df)
        use_window = size is not None and size <= window_max_bytes
    if use_window:
        # deliberately unpartitioned: a dense GLOBAL ordinal needs a
        # global order. This path is for DIMENSION-sized inputs only
        # (its WindowExec single-partition warning is the documented
        # exception in SCALE.md "Unpartitioned windows"); fact-scale
        # callers pass use_window=False for the parallel zip path.
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(id_col, F.row_number().over(w))
    return zip_with_index(df.orderBy(*order_by), id_col=id_col)


def with_int_id(
    df: DataFrame,
    value_col: str,
    id_col: str | None = None,
    keep_value: bool = False,
    use_window: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Re-key a string/composite column to a dense int id.

    Returns ``(rekeyed_df, mapping_df)`` where ``mapping_df`` has
    ``(value_col, id_col)`` for the distinct sorted values — the
    equivalent of ``materialise_with_int_id``
    (``spark_utils.py:176-230``), reusable as a dimension table.
    """
    id_col = id_col or f"{value_col}_id"
    mapping = dense_ids(
        df.select(value_col).distinct(), order_by=[value_col], id_col=id_col,
        use_window=use_window,
    )
    joined = df.join(mapping, value_col, "inner")
    if not keep_value:
        joined = joined.drop(value_col)
    return joined, mapping
