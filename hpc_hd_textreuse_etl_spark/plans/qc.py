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


# ---------------------------------------------------------------------------
# Declarative data-quality expectations — the contract layer a pipeline
# runs before publishing a table (null/uniqueness/range/domain/FK/row
# count). Each helper returns a ONE-ROW DataFrame (expectation, metric,
# passed); run_expectations unions them into the audit report. All
# violation metrics are exact integer counts, so the whole report is
# value-hash gateable.
# ---------------------------------------------------------------------------


def _report(name: str, metric, passed) -> list:
    return [
        F.lit(name).alias("expectation"),
        metric.cast("bigint").alias("metric"),
        passed.alias("passed"),
    ]


def expect_not_null(df: DataFrame, col: str, name: str | None = None) -> DataFrame:
    m = F.coalesce(F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)), F.lit(0))
    return df.agg(*_report(name or f"not_null:{col}", m, m == 0))


def expect_unique(df: DataFrame, cols: list[str], name: str | None = None) -> DataFrame:
    """Excess duplicate rows over the key (0 = unique). Rows with any
    NULL key component are excluded (count_distinct semantics)."""
    nn = df.na.drop(subset=cols)
    m = F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])
    return nn.agg(*_report(name or f"unique:{','.join(cols)}", m, m == 0))


def expect_in_range(
    df: DataFrame, col: str, lo, hi, name: str | None = None
) -> DataFrame:
    m = F.sum(
        F.when((F.col(col) < lo) | (F.col(col) > hi), 1).otherwise(0)
    )
    m = F.coalesce(m, F.lit(0))
    return df.agg(*_report(name or f"in_range:{col}", m, m == 0))


def expect_in_set(
    df: DataFrame, col: str, values: list, name: str | None = None
) -> DataFrame:
    m = F.sum(
        F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
    )
    m = F.coalesce(m, F.lit(0))
    return df.agg(*_report(name or f"in_set:{col}", m, m == 0))


def expect_foreign_key(
    child: DataFrame,
    col: str,
    parent: DataFrame,
    parent_col: str,
    name: str | None = None,
) -> DataFrame:
    """Non-null child keys with no parent row (anti-join count — the
    parent key set broadcasts when it's a dimension)."""
    orphans = (
        child.select(F.col(col).alias("__k"))
        .where(F.col("__k").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("__k")).distinct(),
            "__k",
            "left_anti",
        )
    )
    m = F.count(F.lit(1))
    return orphans.agg(*_report(name or f"foreign_key:{col}", m, m == 0))


def expect_row_count_between(
    df: DataFrame, lo: int, hi: int, name: str = "row_count"
) -> DataFrame:
    m = F.count(F.lit(1))
    return df.agg(*_report(name, m, (m >= lo) & (m <= hi)))


def run_expectations(checks: list[DataFrame]) -> DataFrame:
    """Union the per-expectation reports into one audit table."""
    if not checks:
        raise ValueError("no expectations given")
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def analyze_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """ANALYZE-style one-pass column profile: per column row count,
    null count, exact distinct count, and min/max (as strings, for a
    uniform schema). One aggregate job — Spark plans the multi-distinct
    via Expand, a single shuffle; at 100 TB swap the exact distincts
    for the mergeable HLL registers (operators/sketches.py) and keep
    the same report shape. count_distinct ignores NULLs (profiled
    separately by n_nulls)."""
    cols = list(cols or df.columns)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint").alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"__nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(*[
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.coalesce(F.col(f"__nn_{c}"), F.lit(0)).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_value"),
            F.col(f"__mx_{c}").alias("max_value"),
        )
        for c in cols
    ])
    return one.select(F.inline(per_col))
