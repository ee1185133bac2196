"""Quality-control reporting — the reference's per-materialization QC
practice (SURVEY §5): row counts and publication-year histograms emitted
as metadata (``assets/publication_date.py:73-84,196-215``,
``assets/ids_and_mappings.py:41-42``). Here they are plain functions
over DataFrames so any registry stage can attach them."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qc_summary(df: DataFrame) -> dict[str, int]:
    """Row count + null counts per column in ONE pass (single job —
    the reference runs a count per table; this folds the null audit in)."""
    aggs = [F.count(F.lit(1)).alias("__rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(c)
        for c in df.columns
    ]
    row = df.agg(*aggs).first()
    out = {"rows": row["__rows"]}
    out.update({f"null_{c}": row[c] for c in df.columns})
    return out


def set_disagreement(
    a: DataFrame, b: DataFrame, group_col: str, member_col: str
) -> DataFrame:
    """Groups whose member sets differ between two independently-derived
    tables — the reference's cluster-consistency check
    (``etl_textreuse/scratch.py:46-54``: DISTINCT cluster_id where
    ``earliest_textreuse_by_cluster`` names a different trs than the one
    ``earliest_work_and_pieces_by_cluster``'s pieces map to).

    Implemented as the symmetric difference via a full outer join on
    (group, member): a row missing on either side marks the group.
    One shuffle on the composite key; output is DISTINCT group ids,
    expected EMPTY when the two derivations agree."""
    ka = a.select(F.col(group_col).alias("g"), F.col(member_col).alias("m"),
                  F.lit(1).alias("in_a"))
    kb = b.select(F.col(group_col).alias("g"), F.col(member_col).alias("m"),
                  F.lit(1).alias("in_b"))
    return (
        ka.join(kb, ["g", "m"], "full_outer")
        .where(F.col("in_a").isNull() | F.col("in_b").isNull())
        .select(F.col("g").alias(group_col))
        .distinct()
    )


def cluster_component_violations(
    cluster_labels: DataFrame,
    component_labels: DataFrame,
    node_col: str = "node",
    cluster_col: str = "cluster",
    component_col: str = "component",
) -> DataFrame:
    """Clusters spanning more than one connected component — impossible
    for any label-propagation clustering, since labels only travel along
    edges (the invariant operators/graph.py's docstring states for
    Chinese Whispers). Returns ``(cluster, n_components)`` rows with
    ``n_components > 1``; expected EMPTY. This is the oracle-adjacent
    gate for the randomized CW query: CW itself can't hash-match a SQL
    oracle, but this invariant can (0 violations in both engines)."""
    joined = cluster_labels.select(
        F.col(node_col).alias("n"), F.col(cluster_col).alias("cluster")
    ).join(
        component_labels.select(
            F.col(node_col).alias("n"), F.col(component_col).alias("component")
        ),
        "n",
    )
    return (
        joined.groupBy("cluster")
        .agg(F.countDistinct("component").alias("n_components"))
        .where(F.col("n_components") > 1)
    )


def year_histogram(df: DataFrame, date_col: str, top: int = 10) -> DataFrame:
    """Earliest-N + latest-N publication-year counts — the reference's
    sanity report for date-parse regressions."""
    years = df.groupBy(F.year(date_col).alias("year")).agg(
        F.count(F.lit(1)).alias("n")
    )
    earliest = years.orderBy("year").limit(top)
    latest = years.orderBy(F.desc("year")).limit(top)
    return earliest.unionByName(latest).distinct().orderBy("year")
