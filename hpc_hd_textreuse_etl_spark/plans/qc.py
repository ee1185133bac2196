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


def year_histogram(df: DataFrame, date_col: str, top: int = 10) -> DataFrame:
    """Earliest-N + latest-N publication-year counts — the reference's
    sanity report for date-parse regressions."""
    years = df.groupBy(F.year(date_col).alias("year")).agg(
        F.count(F.lit(1)).alias("n")
    )
    earliest = years.orderBy("year").limit(top)
    latest = years.orderBy(F.desc("year")).limit(top)
    return earliest.unionByName(latest).distinct().orderBy("year")
