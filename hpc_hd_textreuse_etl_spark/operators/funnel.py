"""Ordered-sequence funnel analysis over event streams.

"How many users viewed → clicked → purchased, in that order, each step
within N seconds of the previous?" — the canonical product-analytics
query. Semantics are the *greedy earliest-completion* funnel: the entry
step binds to the user's earliest step-1 event, and each later step to
the earliest event of its type **strictly after** the previous bound
(and, with ``within_seconds``, no later than ``prev + within``). Greedy
binding is the standard tool semantics and is what the min-chain SQL
formulation computes; the two are provably the same (induction on
stages: the automaton below accepts exactly the earliest qualifying
event of the next step type).

Plan shape — ONE shuffle on the user key. Events are collected and
sorted per user (``sort_array(collect_list(struct(us, type)))``), then
a Catalyst ``aggregate`` fold runs the stage automaton over the sorted
array entirely JVM-side: the accumulator is the array of bound step
timestamps, an event appends iff it matches the next expected step and
respects the bounds. Per-user state is O(events-per-user) — the same
bound any per-user sessionization carries — and nothing else shuffles.
The alternative k-stage join chain costs k shuffles and k scans; at
100 TB the fold wins by a wide margin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within_seconds: int | None = None,
    stage_col: str = "stage",
    ts_prefix: str = "t",
) -> DataFrame:
    """Per-user funnel progression.

    Output: ``(user_col, stage, t1 … tk)`` — ``stage`` is the number of
    steps completed (0..k), ``tN`` the bound timestamp of step N in
    epoch microseconds (NULL past ``stage``). Every user present in
    ``events`` gets a row, including stage-0 users. Deterministic: step
    binding depends only on event (timestamp, type) multisets, and ties
    at the same microsecond cannot flip bindings because later steps
    require *strictly* increasing timestamps in both the fold and the
    SQL formulation.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("steps must be non-empty")
    if within_seconds is not None and within_seconds <= 0:
        raise ValueError(f"within_seconds must be positive, got {within_seconds}")
    steps_lit = F.array(*[F.lit(s) for s in steps])
    within_us = None if within_seconds is None else within_seconds * 1_000_000

    evs = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("us"),
                F.col(type_col).alias("et"),
            )
        )
    )

    def step(acc: Column, e: Column) -> Column:
        # F.get is the null-safe (non-ANSI-throwing) indexer: past-end
        # lookups yield NULL, which the conjunction treats as no-match.
        expected = F.get(steps_lit, F.size(acc))
        prev = F.get(acc, F.size(acc) - 1)
        cond = e["et"] == expected
        cond = cond & ((F.size(acc) == 0) | (e["us"] > prev))
        if within_us is not None:
            cond = cond & (
                (F.size(acc) == 0) | (e["us"] <= prev + F.lit(within_us))
            )
        return F.when(cond, F.concat(acc, F.array(e["us"]))).otherwise(acc)

    path = F.aggregate(evs, F.array().cast("array<bigint>"), step)

    per_user = events.groupBy(user_col).agg(path.alias("__path"))
    cols = [
        F.col(user_col),
        F.size("__path").cast("int").alias(stage_col),
    ]
    for i in range(1, k + 1):
        cols.append(F.get("__path", i - 1).alias(f"{ts_prefix}{i}"))
    return per_user.select(*cols)


def funnel_conversion(
    funnel_df: DataFrame, stage_col: str = "stage"
) -> DataFrame:
    """Collapse per-user funnel rows into the stage report: users
    reaching at least each stage, plus the step-to-step conversion
    rate. Input is the output of :func:`funnel`; the result has one row
    per stage (tiny — safe to collect/plot)."""
    from pyspark.sql import Window

    by_stage = funnel_df.groupBy(stage_col).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    # unpartitioned windows here run over the per-STAGE table (a
    # handful of rows, one per funnel stage) — the WindowExec
    # single-partition warning is benign by construction (SCALE.md
    # "Unpartitioned windows")
    w_cum = (
        Window.orderBy(F.desc(stage_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = by_stage.withColumn("n_at_least", F.sum("n_exact").over(w_cum))
    w_prev = Window.orderBy(stage_col)
    return (
        cum.withColumn(
            "conversion",
            F.col("n_at_least")
            / F.lag("n_at_least", 1, None).over(w_prev),
        )
        .orderBy(stage_col)
    )
