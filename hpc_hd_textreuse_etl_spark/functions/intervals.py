"""Gaps-and-islands interval merging (the reference's coverage core).

The reference merges possibly-overlapping character-offset spans per
document pair with a three-window pipeline
(``etl_textreuse/assets/coverages.py:36-139``):

1. ``ROW_NUMBER() OVER (PARTITION BY group ORDER BY start, end)``
2. running ``MAX(end) OVER (... ROWS UNBOUNDED PRECEDING TO 1 PRECEDING)``
   — preferred over LAG because an earlier interval can swallow later ones
3. island id = running ``SUM(CASE WHEN previous_end + gap >= start THEN 0
   ELSE 1 END)`` — note ``+ gap``: with ``adjacency_gap=1`` touching
   ranges (1,6),(7,12) merge, matching ``coverages.py:81-85``.

All three windows share one partitioning (group cols) and one sort, so
Spark executes a single shuffle + single sort for the whole pipeline —
this holds at any scale as long as no single group exceeds a task's
memory (groups here are document pairs / users: naturally bounded).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mark_islands(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str,
    end_col: str,
    adjacency_gap: int = 1,
    island_col: str = "island_id",
) -> DataFrame:
    """Tag each row with the id of the merged interval ("island") it
    belongs to within its group. Island ids are dense 1..K per group."""
    part = [F.col(c) for c in group_cols]
    w_order = Window.partitionBy(*part).orderBy(F.col(start_col), F.col(end_col))
    prev_end = (
        F.max(F.col(end_col))
        .over(w_order.rowsBetween(Window.unboundedPreceding, -1))
    )
    new_island = F.when(
        prev_end.isNull() | (prev_end + F.lit(adjacency_gap) < F.col(start_col)),
        F.lit(1),
    ).otherwise(F.lit(0))
    # running sum over the same window ⇒ same single sort/shuffle
    island = F.sum(new_island).over(
        w_order.rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(island_col, island)


def merge_intervals(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str,
    end_col: str,
    adjacency_gap: int = 1,
) -> DataFrame:
    """Collapse overlapping/adjacent intervals per group.

    Returns one row per island: group cols + ``island_id``,
    ``island_start`` (min start), ``island_end`` (max end), ``n_rows``
    (source-interval count). Length conventions are left to the caller
    (the reference uses ``max(end) - min(start)`` at
    ``coverages.py:95``, i.e. end-exclusive spans).
    """
    marked = mark_islands(df, group_cols, start_col, end_col, adjacency_gap)
    return marked.groupBy(*group_cols, "island_id").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def coverage(
    df: DataFrame,
    group_cols: Sequence[str],
    start_col: str,
    end_col: str,
    adjacency_gap: int = 1,
) -> DataFrame:
    """Per-group totals over merged intervals: covered length, island
    count, source-interval count — the two-level aggregation of
    ``coverages.py:88-139`` (islands → per-pair totals)."""
    islands = merge_intervals(df, group_cols, start_col, end_col, adjacency_gap)
    return islands.groupBy(*group_cols).agg(
        F.sum(F.col("island_end") - F.col("island_start")).alias("covered_len"),
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("n_rows").alias("n_intervals"),
    )


def prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_buckets: int = 32,
) -> DataFrame:
    """Distributed global running sum of ``value_col`` in ``order_col``
    order — the scalable replacement for an unpartitioned
    ``Window.orderBy`` (which funnels every row through ONE task).

    Classic two-pass partial-prefix shape:

    1. range-repartition on the order key (equal keys land in one
       partition; partition ids are range-ordered), run the cumulative
       window WITHIN each partition — parallel, bounded per-task;
    2. per-partition totals (``num_buckets`` rows) get their own
       prefix-sum on the tiny side and broadcast back as additive
       offsets.

    Ties on ``order_col`` take the whole tied group's sum (RANGE frame),
    matching ANSI ``SUM() OVER (ORDER BY ...)`` semantics."""
    return prefix_sums(df, order_col, [value_col], [out_col], num_buckets)


def prefix_sums(
    df: DataFrame,
    order_col: str,
    value_cols: Sequence[str],
    out_cols: Sequence[str],
    num_buckets: int = 32,
    total_cols: Sequence[str] | None = None,
) -> DataFrame:
    """:func:`prefix_sum` over several value columns at once: all the
    local cumulative windows share one range-repartition and one sort,
    and the per-partition offset table carries every column — N running
    sums for the price of one (vs N chained calls = N repartitions).

    ``total_cols`` (same length as ``value_cols``) additionally attaches
    the GLOBAL sum of each value column to every output row, derived
    from the per-partition totals table (≤ ``num_buckets`` rows) and
    broadcast back. Callers that need grand totals alongside the running
    sums (threshold sweeps: ``fn = P - tp``) would otherwise aggregate
    ``df`` in a separate branch — at corpus scale that is a second full
    scan + shuffle of the input subtree; here it is a ≤ num_buckets-row
    aggregate of partials the prefix pass computes anyway."""
    if len(value_cols) != len(out_cols) or not value_cols:
        raise ValueError("value_cols and out_cols must be same non-zero length")
    if total_cols is not None and len(total_cols) != len(value_cols):
        raise ValueError("total_cols must align with value_cols")
    parts = df.repartitionByRange(num_buckets, F.col(order_col)).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_local = Window.partitionBy("__pid").orderBy(order_col)
    local = parts
    for i, v in enumerate(value_cols):
        local = local.withColumn(f"__run{i}", F.sum(v).over(w_local))
    totals = local.groupBy("__pid").agg(
        *[F.sum(v).alias(f"__tot{i}") for i, v in enumerate(value_cols)]
    )
    # strictly-prior totals as a broadcast theta-self-join instead of an
    # unpartitioned Window.orderBy: over the ≤ num_buckets totals rows
    # the O(B²) nested-loop pairing is trivial, and it keeps the plan
    # free of the single-partition WindowExec (whose warning is a real
    # scale alarm everywhere else — no benign trips to teach readers to
    # ignore). NULL __tot columns cannot occur (sums over the fully
    # materialized partition), so the left-join coalesce is the empty-
    # prior-set case only.
    prior = totals.select(
        F.col("__pid").alias("__ppid"),
        *[F.col(f"__tot{i}").alias(f"__ptot{i}") for i in range(len(value_cols))],
    )
    # Theta-join the broadcast totals against the STATIC pid domain
    # 0..num_buckets-1 (repartition(num_buckets) partition ids), not
    # against `totals` itself: as the left side, `totals` is column-
    # pruned to a keys-only distinct whose canonical plan no longer
    # matches the totals exchange, so the planner re-ran the ENTIRE
    # input subtree a second time just to list the pids (verified:
    # executed threshold-sweep plan had a duplicate full scan). Pids of
    # empty partitions get an offset row that the final inner join
    # simply never matches.
    pid_domain = df.sparkSession.range(num_buckets).select(
        F.col("id").cast("int").alias("__pid")
    )
    offsets = (
        pid_domain.join(
            F.broadcast(prior), F.col("__ppid") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(
            *[
                F.coalesce(F.sum(f"__ptot{i}"), F.lit(0)).alias(f"__off{i}")
                for i in range(len(value_cols))
            ]
        )
    )
    out = local.join(F.broadcast(offsets), "__pid")
    for i, o in enumerate(out_cols):
        out = out.withColumn(o, F.col(f"__run{i}") + F.col(f"__off{i}"))
    if total_cols is not None:
        # empty input: the 1-row agg yields NULL sums, but `out` is
        # empty then too, so the coalesce-to-0 never surfaces a row
        grand = totals.agg(
            *[
                F.coalesce(F.sum(f"__tot{i}"), F.lit(0)).alias(c)
                for i, c in enumerate(total_cols)
            ]
        )
        out = out.crossJoin(F.broadcast(grand))
    return out.drop(
        "__pid",
        *[f"__run{i}" for i in range(len(value_cols))],
        *[f"__off{i}" for i in range(len(value_cols))],
    )
