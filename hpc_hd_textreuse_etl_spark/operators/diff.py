"""Table diff / reconciliation: classify every key as added, removed,
changed, or unchanged between two versions of a table.

The ops primitive behind migration validation ("does the new pipeline
produce the same serving table?"), CDC audit, and snapshot drift
monitoring. One full-outer join on the key — the minimal data motion
the problem admits — with null-safe per-column comparison (a NULL→value
transition IS a change; two NULLs are not) and the changed column
names reported per row.

Scale shape: one shuffle per side on the key; comparison is a
codegen'd projection. For very wide rows, pass ``compare_cols`` to
prune the scan to the columns that matter (the parquet reader then
never materializes the rest). Summary is a map-side-combined count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    status_col: str = "diff_status",
    changed_col: str = "changed_cols",
) -> DataFrame:
    """Full-outer key reconciliation.

    Output: key columns + ``diff_status`` ('added' — in new only,
    'removed' — in old only, 'changed', 'unchanged') + ``changed_cols``
    (comma-joined sorted names of differing columns, '' otherwise).
    Comparison is null-safe per column. Key collisions (duplicate keys
    in either input) are the caller's contract to prevent — assert
    uniqueness upstream (see plans/qc.py expectations).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(key_cols)
        ]
    if not compare_cols:
        raise ValueError("no columns to compare")
    o = old.select(
        *key_cols,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *key_cols,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, list(key_cols), "full_outer")
    diffs = F.array_compact(
        F.array(*[
            F.when(
                ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")), F.lit(c)
            )
            for c in sorted(compare_cols)
        ])
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        *key_cols,
        status.alias(status_col),
        F.when(
            status == "changed", F.array_join(diffs, ",")
        ).otherwise(F.lit("")).alias(changed_col),
    )


def diff_summary(
    diff: DataFrame,
    status_col: str = "diff_status",
    changed_col: str = "changed_cols",
) -> DataFrame:
    """Counts per (status, changed column set) — the reconciliation
    report. Tiny output (≤ statuses × observed column sets)."""
    return diff.groupBy(status_col, changed_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
