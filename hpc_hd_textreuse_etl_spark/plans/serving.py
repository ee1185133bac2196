"""Downstream serving workload — the query shapes the reference's users
actually run against the materialized/denormalized tables.

The reference ships the ETL; its companion paper ("Optimizing a Data
Science System for Text Reuse Analysis", arXiv:2401.07290, cited at
assets/README.md:506) defines the serving workload those tables and
their MariaDB indexes exist for: *reception* (everything downstream of
a given source document, with metadata) and *top quotes* (the most
widely received passages). The cluster-time-span QC query lives in the
reference's scratch pad (etl_textreuse/scratch.py:55-68).

Design for scale: these are point/top-k queries over the big denorm
fact tables. On Spark they lean on partition pruning (filter on the
leading partition/bucket column reaches the parquet scan), broadcast
metadata dims, and TakeOrderedAndProject for the top-k — no global
sort ever materializes.

Determinism note: the reference's ``ORDER BY span DESC LIMIT 100`` is
nondeterministic when rows tie at the cut; every top-k here adds the
group key as a tiebreaker so results are stable across engines and
reruns (deliberate deviation, same spirit as the seeded CLP coin).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_time_spans(
    members: DataFrame,
    group_col: str,
    date_col: str,
    k: int = 100,
) -> DataFrame:
    """Top-k groups by publication-date span — the reference's
    "time spans of clusters" QC query (scratch.py:55-68): per cluster
    MIN/MAX date and their difference in days, largest spans first.

    ``ORDER BY … LIMIT`` plans as TakeOrderedAndProject: each task
    keeps a k-row heap, the driver merges — no global sort."""
    return (
        members.groupBy(group_col)
        .agg(
            F.max(date_col).alias("max_pub_date"),
            F.min(date_col).alias("min_pub_date"),
        )
        .select(
            group_col,
            F.date_format("max_pub_date", "yyyy-MM-dd").alias("max_pub_date"),
            F.date_format("min_pub_date", "yyyy-MM-dd").alias("min_pub_date"),
            F.datediff("max_pub_date", "min_pub_date").alias("span_days"),
        )
        .orderBy(F.desc("span_days"), F.asc(group_col))
        .limit(k)
    )


def top_quotes(
    edges: DataFrame,
    src_cols: Sequence[str],
    dst_col: str,
    k: int = 20,
) -> DataFrame:
    """The paper's top-quote workload: source spans ranked by how many
    distinct destinations received them. ``n_receptions`` is exact
    COUNT(DISTINCT); at corpus scale swap in approx_count_distinct when
    a ±2% rank suffices (documented, not silently)."""
    return (
        edges.groupBy(*src_cols)
        .agg(F.countDistinct(dst_col).alias("n_receptions"))
        .orderBy(F.desc("n_receptions"), *[F.asc(c) for c in src_cols])
        .limit(k)
    )


def reception_detail(
    edges: DataFrame,
    src_col: str,
    src_ids: DataFrame,
    metadata: DataFrame,
    meta_key: str,
) -> DataFrame:
    """The paper's reception point-query: all destinations downstream
    of a requested source set, enriched with destination metadata.

    ``src_ids`` (the user's selection — typically one document) is
    broadcast as a semi-join so the fact scan prunes early; the
    metadata dim is broadcast for the enrichment join. At scale the
    fact table is partitioned/bucketed by ``src_col`` so the semi-join
    prunes partitions instead of scanning the corpus."""
    picked = edges.join(F.broadcast(src_ids), src_col, "left_semi")
    return picked.join(F.broadcast(metadata), picked[meta_key] == metadata[meta_key]).drop(
        metadata[meta_key]
    )
