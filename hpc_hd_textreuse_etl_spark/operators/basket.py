"""Market-basket association rules (frequent pairs → confidence/lift).

The classic co-purchase primitive: for every ordered item pair (a, b),
support counts n_ab / n_a / n_b against the basket universe N, and the
derived confidence P(b|a) and lift P(ab)/(P(a)P(b)). A full Apriori
over arbitrary-size itemsets is exponential; at 100 TB the shape that
survives is the PAIR rule mine over bounded baskets — which is exactly
what co-purchase panels, "related items", and feature-co-occurrence
audits consume.

Scale design:

- item-set extraction is one ``distinct`` (dedup multiplicities inside
  a basket), one shuffle on (basket, item);
- the pair generation is a *within-basket* self-equi-join on the basket
  id with ``item_a < item_b`` — fan-out is C(|basket|, 2), quadratic
  only in the per-basket item count, which real baskets bound at tens.
  Pathological mega-baskets should be capped upstream (``per_key_quota``
  from operators/sampling.py) — a basket with 10^5 distinct items is a
  crawler artifact, not a purchase;
- singleton supports are a map-side-combined count on the item key and
  join back broadcast (item dims are small relative to fact tables);
- confidence / lift are fixed-order per-row IEEE divisions of exact
  bigint counts — deterministic across engines, so the whole rule
  table (not just the counts) sits under a value-hash gate.

No reference counterpart (the reference has no basket mining); this is
one of the beyond-parity training-/analytics-pipeline operators.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_items(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """Distinct (basket, item) pairs — multiplicity inside a basket does
    not count toward support."""
    return df.select(
        F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
    ).distinct()


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 1,
    broadcast_items: bool = False,
) -> DataFrame:
    """Pair association rules over baskets.

    Returns one row per unordered item pair (emitted once with
    ``item_a < item_b``): exact supports ``n_ab``/``n_a``/``n_b``/
    ``n_baskets`` plus ``confidence`` (P(item_b | item_a)) and ``lift``.
    For the symmetric rule a←b, confidence is n_ab/n_b — derivable from
    the emitted counts, so it is not duplicated.

    ``broadcast_items`` opt-in hints the singleton-support table (one
    row per distinct item) into both joins. Item universes are unbounded
    in general, so the default lets AQE pick the strategy (it broadcasts
    small sides at runtime anyway); force the hint only when the item
    dimension is known-bounded. The 1-row basket count is always
    broadcast."""
    items = basket_items(df, basket_col, item_col)
    n_baskets = items.agg(
        F.count_distinct("basket").cast("bigint").alias("n_baskets")
    )

    a = items.select(F.col("basket"), F.col("item").alias("item_a"))
    b = items.select(F.col("basket"), F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= min_pair_support)
    )
    singles = items.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    hint = F.broadcast if broadcast_items else (lambda d: d)
    out = (
        pairs.join(
            hint(singles.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            hint(singles.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    conf = F.col("n_ab").cast("double") / F.col("n_a").cast("double")
    lift = (F.col("n_ab").cast("double") * F.col("n_baskets").cast("double")) / (
        F.col("n_a").cast("double") * F.col("n_b").cast("double")
    )
    return out.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        conf.alias("confidence"),
        lift.alias("lift"),
    )


def frequent_items(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Apriori level 1 — items whose basket support clears the bar.
    Feed its output through a semi-join to prune the pair join's input
    when the item universe is huge and the support floor is high."""
    return (
        basket_items(df, basket_col, item_col)
        .groupBy("item")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .where(F.col("n") >= min_support)
    )


def prune_to_frequent(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int,
) -> DataFrame:
    """Restrict baskets to frequent items (the Apriori downward-closure
    prune): a broadcastable semi-join, so the expensive pair join only
    ever sees items that can appear in a qualifying pair."""
    freq = frequent_items(df, basket_col, item_col, min_support)
    return df.join(
        F.broadcast(freq.select(F.col("item").alias(item_col))),
        item_col,
        "left_semi",
    )
