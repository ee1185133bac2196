"""Distinct-count sketching: K-Minimum-Values (KMV / bottom-k).

Spark already ships HyperLogLog++ (``approx_count_distinct``) — that
stays the production default for one-shot cardinalities. KMV earns its
place twice over:

- it is *mergeable by construction* (union of bottom-k sets → bottom-k
  of the union), the property a 100 TB pipeline needs to sketch per
  partition / per day and combine later without re-reading data;
- built on the portable md5 hash family (functions/hashing.py) its
  estimate is a pure deterministic function of the input set, so the
  DuckDB oracle can recompute it bit-identically — HLL's engine-private
  register layout never can. That puts cardinality estimation under the
  full value-hash gate instead of a rows-only check.

Estimator (Bar-Yossef et al. 2002): normalize the 60-bit hash to
``u = H / 2^60`` in (0,1); with ``u_(k)`` the k-th smallest *distinct*
hash, ``D ≈ (k-1) / u_(k)``; exact when the group has < k distinct
values. Standard error ≈ 1/sqrt(k-2).

Plan shape: distinct on (keys, hash) — map-side partial dedup then one
exchange — followed by a per-key sort-window that keeps rank ≤ k and a
final per-key agg. Every step is Catalyst built-ins; the window sort is
spillable, and per-key state after the rank filter is k rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64

#: 2^60 as an exact double — the normalizer for the 60-bit portable hash.
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    k: int = 256,
    estimate_col: str = "kmv_estimate",
) -> DataFrame:
    """Per-key approximate COUNT(DISTINCT value) via a bottom-k sketch.

    Returns one row per key group: ``(*key_cols, <estimate_col>)``.
    ``value_col`` is cast to string before hashing (md5 is byte-wise),
    so cross-engine parity requires a type whose string form is stable —
    ints, strings, dates all qualify.
    """
    if k < 3:
        raise ValueError("KMV needs k >= 3 (stderr ~ 1/sqrt(k-2))")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = list(key_cols)
    hashed = df.select(*keys, portable_hash64(v.cast("string")).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    bottom = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = bottom.groupBy(*keys).agg(
        F.max("__h").alias("__kth"), F.count(F.lit(1)).alias("__n")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        (F.lit(float(k - 1))) / (F.col("__kth") / F.lit(HASH_SPACE))
    )
    return agg.select(*keys, est.alias(estimate_col))


def kmv_bottom_k(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    k: int = 256,
) -> DataFrame:
    """The raw mergeable sketch: per key, the sorted array of its ≤ k
    smallest distinct hashes. Two sketches over disjoint (or
    overlapping) data merge with :func:`kmv_merge` — union the arrays,
    dedup, keep the k smallest — without touching the original rows."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = list(key_cols)
    hashed = df.select(*keys, portable_hash64(v.cast("string")).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmv_hashes"))
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, key_cols: Sequence[str], k: int = 256
) -> DataFrame:
    """Merge two bottom-k sketch tables (full outer on keys): bottom-k
    of the deduped union of hash arrays — the estimator over the merge
    equals the estimator over the concatenated inputs."""
    keys = list(key_cols)
    merged = (
        a.withColumnRenamed("kmv_hashes", "__ha")
        .join(b.withColumnRenamed("kmv_hashes", "__hb"), keys, "full")
        .select(
            *keys,
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce("__ha", F.array().cast("array<bigint>")),
                            F.coalesce("__hb", F.array().cast("array<bigint>")),
                        )
                    )
                ),
                1,
                k,
            ).alias("kmv_hashes"),
        )
    )
    return merged


def kmv_estimate_from_sketch(
    sketch: DataFrame, k: int = 256, estimate_col: str = "kmv_estimate"
) -> DataFrame:
    """Evaluate the estimator on a (possibly merged) bottom-k sketch."""
    n = F.size("kmv_hashes")
    kth = F.element_at("kmv_hashes", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / (kth / F.lit(HASH_SPACE))
    )
    return sketch.select(
        *[c for c in sketch.columns if c != "kmv_hashes"], est.alias(estimate_col)
    )
