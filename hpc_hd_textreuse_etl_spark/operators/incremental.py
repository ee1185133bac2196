"""Incremental aggregate maintenance (materialized-view delta merge).

At 100 TB you do not recompute yesterday's aggregate table from
history — you fold the day's delta into it. That only works for
aggregates with a merge algebra: ``count``/``sum`` merge by addition,
``min``/``max`` by themselves. (``avg`` is carried as sum+count and
finalized at read; non-algebraic aggregates — exact median, distinct
count — need a sketch: see operators/sketches.py for the mergeable KMV
and CMS forms.)

The implementation is the same trick Spark's partial aggregation uses
inside one query, lifted across *runs*: the snapshot rows ARE partial
states, the delta is aggregated into partial states, and a unionByName
+ re-aggregate with each column's merge function combines them. One
shuffle over (snapshot keys + delta keys); history is never touched.

``AGG_SPECS`` maps each supported aggregate to (delta-expr, merge-fn);
adding an algebra (e.g. bitwise OR for bloom membership) is one row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate -> (initial partial over the delta, merge over partials)
AGG_SPECS = {
    "count": (lambda c: F.count(F.lit(1)).cast("bigint"), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def aggregate_delta(
    delta: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
) -> DataFrame:
    """Collapse raw delta rows to one partial-state row per key.
    ``specs``: ``{out_col: (agg_name, input_col)}`` with agg_name in
    AGG_SPECS (input_col ignored for "count")."""
    aggs = []
    for out, (name, col) in specs.items():
        if name not in AGG_SPECS:
            raise ValueError(
                f"unsupported aggregate {name!r}; mergeable: {sorted(AGG_SPECS)}"
            )
        init, _ = AGG_SPECS[name]
        c = F.col(col) if isinstance(col, str) else col
        aggs.append(init(c).alias(out))
    return delta.groupBy(*key_cols).agg(*aggs)


def merge_aggregate_states(
    snapshot: DataFrame | None,
    delta_states: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
) -> DataFrame:
    """Fold partial states into the snapshot (both keyed on
    ``key_cols`` with the spec's output columns). Keys present in only
    one side pass through; keys in both merge column-wise with each
    aggregate's merge function. ``snapshot=None`` bootstraps."""
    if snapshot is None:
        return delta_states
    cols = [*key_cols, *specs]
    both = snapshot.select(*cols).unionByName(delta_states.select(*cols))
    merges = []
    for out, (name, _) in specs.items():
        _, merge = AGG_SPECS[name]
        merges.append(merge(F.col(out)).alias(out))
    return both.groupBy(*key_cols).agg(*merges)


def incremental_aggregate(
    snapshot: DataFrame | None,
    delta: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
) -> DataFrame:
    """``merge(snapshot, aggregate(delta))`` — the invariant (tested and
    oracle-gated): for any split of the data into snapshot-history and
    delta, the result equals aggregating everything from scratch."""
    return merge_aggregate_states(
        snapshot, aggregate_delta(delta, key_cols, specs), key_cols, specs
    )


def join_delta(
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """Delta of the inner equi-join A ⋈ B under insert-only appends:

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (disjoint by construction — each output row pairs one tuple from
    each input, and a pair is new iff at least one side is new; the
    three terms partition "which side is new"). Updates/deletes are out
    of scope by design: route them through CDC compaction
    (operators/cdc.py) so the join sees insert-only key versions.

    Scale shape: every term has a DELTA on at least one side — the
    snapshot-×-snapshot join (the expensive one) never reruns. Daily
    deltas are usually broadcastable; snapshot sides stream past them.
    """
    return (
        a_delta.join(b_old, list(on))
        .unionByName(a_old.join(b_delta, list(on)))
        .unionByName(a_delta.join(b_delta, list(on)))
    )


def incremental_join(
    j_old: DataFrame,
    a_old: DataFrame,
    a_delta: DataFrame,
    b_old: DataFrame,
    b_delta: DataFrame,
    on: Sequence[str],
) -> DataFrame:
    """New materialized join = old snapshot ∪ join delta. The identity
    J_new = (A∪ΔA) ⋈ (B∪ΔB) is what the oracle-gated contract query
    recomputes from scratch."""
    return j_old.unionByName(join_delta(a_old, a_delta, b_old, b_delta, on))


def retractable_aggregate_delta(
    delta: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
    op_col: str = "op",
) -> DataFrame:
    """Partial states over a SIGNED change stream: rows carry
    ``op_col`` ∈ {'I', 'D'} and deletes contribute negatively — the
    retraction half of incremental view maintenance.

    Only the abelian-group aggregates (count/sum) admit retractions:
    subtracting a delete is exact because every element has an inverse.
    min/max do NOT — deleting the current minimum requires knowing the
    runner-up, i.e. the full multiset — so they are rejected here;
    recompute affected keys from the base table instead
    (:func:`affected_keys` + a keyed semi-join re-aggregation, the
    standard "dirty key" repair used by every IVM engine for
    non-invertible aggregates)."""
    bad = [n for n, (name, _) in specs.items() if name not in ("count", "sum")]
    if bad:
        raise ValueError(
            f"retractable aggregates are count/sum only; {bad} are not "
            "(min/max need a dirty-key recompute — see affected_keys)"
        )
    sign = F.when(F.col(op_col) == "D", F.lit(-1)).otherwise(F.lit(1))
    aggs = []
    for out, (name, col) in specs.items():
        if name == "count":
            aggs.append(F.sum(sign).cast("bigint").alias(out))
        else:
            c = F.col(col) if isinstance(col, str) else col
            aggs.append(F.sum(sign * c).alias(out))
    return delta.groupBy(*key_cols).agg(*aggs)


def incremental_aggregate_with_retractions(
    snapshot: DataFrame | None,
    delta: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
    op_col: str = "op",
    count_col: str | None = None,
) -> DataFrame:
    """Fold a signed change stream into the aggregate snapshot. Same
    merge as :func:`merge_aggregate_states` (count/sum merge by
    addition, and negative partials subtract exactly); pass
    ``count_col`` naming a count spec to prune keys whose live row
    count hits zero — otherwise fully-deleted keys linger as zero rows,
    which is both wrong for consumers and permanent state growth."""
    states = retractable_aggregate_delta(delta, key_cols, specs, op_col)
    merged = merge_aggregate_states(snapshot, states, key_cols, specs)
    if count_col is not None:
        merged = merged.where(F.col(count_col) != 0)
    return merged


def affected_keys(
    delta: DataFrame, key_cols: Sequence[str], op_col: str = "op"
) -> DataFrame:
    """Distinct keys touched by deletes — the dirty-key set whose
    non-invertible aggregates (min/max/distinct) must be recomputed
    from the base table (a semi-join restricted re-aggregation: cost ∝
    touched keys, not table size)."""
    return (
        delta.where(F.col(op_col) == "D").select(*key_cols).distinct()
    )


def repair_non_invertible(
    snapshot: DataFrame,
    base: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    specs: dict[str, tuple[str, str | Column | None]],
    op_col: str = "op",
) -> DataFrame:
    """The dirty-key repair for non-invertible aggregates (min/max):
    keys touched by deletes are re-aggregated from the post-change
    ``base`` table (cost ∝ dirty keys via a semi-join restricted scan,
    never the full table) and patched into the snapshot; keys that
    vanish entirely drop out. Clean keys keep their snapshot rows
    untouched. ``base`` must already reflect the delta (it is the
    source of truth the snapshot lags)."""
    keys = list(key_cols)
    dirty = affected_keys(delta, keys, op_col)
    recomputed = aggregate_delta(
        base.join(F.broadcast(dirty), keys, "left_semi"), keys, specs
    )
    clean = snapshot.join(F.broadcast(dirty), keys, "left_anti")
    return clean.unionByName(recomputed)
