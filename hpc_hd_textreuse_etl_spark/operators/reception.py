"""Earliest-source identification and reception-edge expansion.

Re-expresses the reference's downstream-cluster analytics
(``etl_textreuse/assets/downstream_clusters.py:114-150`` and
``etl_textreuse/assets/reception.py:14-102``) as generic operators:

- :func:`earliest_in_group` — keep ALL rows tied for the minimum of an
  ordering column within a group (``MIN(x) OVER (PARTITION BY g)`` +
  filter; `row_number() = 1` would drop ties, which the reference
  explicitly relies on keeping).
- :func:`non_source_members` — group members that are not among the
  earliest, as a native ``left_anti`` join (the reference emulates this
  with a right join + ``IS NULL``, ``reception.py:21-25``; anti-join is
  the idiomatic and cheaper plan — no null-padding, semi-join physical
  strategies apply).
- :func:`reception_edges` — deliberate fan-out join: every earliest
  ("source") row × every non-source row sharing the group key
  (``reception.py:56-61``).

Scale notes: all three are single-shuffle on the group key; the fan-out
join's output dominates cost by design. AQE skew-join splits oversized
groups at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def earliest_in_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
) -> DataFrame:
    """All rows achieving the group minimum of ``order_col`` (ties kept)."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    out = df.withColumn("__min_order", F.min(order_col).over(w))
    return out.filter(F.col(order_col) == F.col("__min_order")).drop("__min_order")


def non_source_members(
    df: DataFrame,
    sources: DataFrame,
    key_cols: Sequence[str],
) -> DataFrame:
    """Rows of ``df`` whose key is absent from ``sources`` (left_anti)."""
    return df.join(sources.select(*key_cols), list(key_cols), "left_anti")


def reception_edges(
    members: DataFrame,
    group_col: str,
    member_key: str,
    order_col: str,
    unique_keys: bool = False,
) -> DataFrame:
    """Edges from each earliest member to every later member per group.

    Returns ``(group_col, src_<member_key>, dst_<member_key>)``. Groups
    whose members are all "earliest" produce no edges (matching the
    reference's semantics for single-source clusters).

    ``unique_keys=True`` asserts ``member_key`` values are globally
    unique (one row per key — true for order keys and piece ids). Then
    "key absent from the earliest set" reduces to "this row is not tied
    for its group minimum", so the anti-join collapses into a filter on
    the SAME min-window output both edge sides already share: one
    group-key exchange drives the whole operator (the dst branch's
    exchange is a runtime ReusedExchange of the src branch's — one scan,
    one shuffle), and the sort-merge fan-out join consumes both branches
    already partitioned and sorted by the group — no re-shuffle, no
    re-sort. NULL ``order_col`` rows are
    never earliest and always non-source — exactly the anti-join's
    treatment (the null-safe filter below preserves it). With duplicate
    keys the two formulations differ (the anti-join removes EVERY row
    of a key that is earliest anywhere), so the default stays on the
    generic anti-join path.
    """
    if unique_keys:
        w = Window.partitionBy(F.col(group_col))
        marked = members.withColumn(
            "__min_order", F.min(order_col).over(w)
        )
        src = marked.filter(
            F.col(order_col) == F.col("__min_order")
        ).select(F.col(group_col), F.col(member_key).alias(f"src_{member_key}"))
        dst = marked.filter(
            F.coalesce(
                F.col(order_col) != F.col("__min_order"), F.lit(True)
            )
        ).select(F.col(group_col), F.col(member_key).alias(f"dst_{member_key}"))
        # merge hint: BOTH fan-out sides are corpus-proportional (src ≈
        # one row per group, dst ≈ all non-earliest members), so letting
        # the planner broadcast either one is a scale hazard — on the
        # test data it actually picked the BIGGER dst side from parquet
        # stats. A sort-merge join on the group key instead reuses the
        # hashpartitioning + sort both branches already carry from the
        # min-window: zero additional exchange, and AQE reuses the one
        # shuffle stage for both branches at runtime.
        return src.join(dst.hint("merge"), group_col)
    earliest = earliest_in_group(members, [group_col], order_col)
    non_source = non_source_members(
        members, earliest.select(member_key), [member_key]
    )
    src = earliest.select(
        F.col(group_col), F.col(member_key).alias(f"src_{member_key}")
    )
    dst = non_source.select(
        F.col(group_col), F.col(member_key).alias(f"dst_{member_key}")
    )
    return src.join(dst, group_col)
