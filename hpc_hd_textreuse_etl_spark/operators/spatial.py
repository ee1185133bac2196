"""Spatial radius joins via grid-cell blocking.

"All pairs of points within distance r" is a θ-join Spark would
otherwise plan as a cartesian product. The standard fix (uniform grid
/ fixed-radius near neighbors) turns it into an equi-join: bin the
plane into r×r cells; two points within distance r are at most one
cell apart in each axis, so replicating ONE side into its 3×3 cell
neighborhood and equi-joining on the cell key covers every qualifying
pair — then an exact distance predicate verifies.

Exactly-once emission without a distinct: only the LEFT side is
replicated, the right side stays in its unique home cell, so a
qualifying pair meets exactly once (at the right point's home cell).
For the self-join, the ``id_a < id_b`` orientation picks one of the
two symmetric encounters — again no dedup shuffle.

Everything is exact integer arithmetic (coordinates and r integers;
compare dx² + dy² ≤ r²) — no floating point, no engine drift, fully
value-hash gateable.

Scale shape: one shuffle per side keyed on the cell id; the 9×
replication multiplies only the (id, x, y) triple, not payloads.
Cell population is bounded by point density × r², the knob the caller
controls; skewed cells (urban cores) split under AQE skew-join since
the join is a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_cells(df: DataFrame, x: str, y: str, r: int, replicate: bool) -> DataFrame:
    cx = F.floor(F.col(x) / F.lit(r))
    cy = F.floor(F.col(y) / F.lit(r))
    if not replicate:
        return df.withColumn("__cx", cx).withColumn("__cy", cy)
    off = F.explode(
        F.array(*[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)
        ])
    )
    return (
        df.withColumn("__o", off)
        .withColumn("__cx", cx + F.col("__o.dx"))
        .withColumn("__cy", cy + F.col("__o.dy"))
        .drop("__o")
    )


def radius_join(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    radius: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Pairs (id_a from left, id_b from right) with euclidean distance
    <= radius (inclusive, exact integer compare). Coordinates must be
    integers; output carries ``dist_sq``."""
    if radius <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    a = _with_cells(
        left.select(F.col(id_left).alias("id_a"),
                    F.col(x_col).alias("xa"), F.col(y_col).alias("ya")),
        "xa", "ya", radius, replicate=True,
    )
    b = _with_cells(
        right.select(F.col(id_right).alias("id_b"),
                     F.col(x_col).alias("xb"), F.col(y_col).alias("yb")),
        "xb", "yb", radius, replicate=False,
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["__cx", "__cy"])
        .withColumn("dist_sq", d2.cast("bigint"))
        .where(F.col("dist_sq") <= F.lit(radius) * F.lit(radius))
        .select("id_a", "id_b", "dist_sq")
    )


def radius_self_join(
    points: DataFrame,
    id_col: str,
    radius: int,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Unordered point pairs within ``radius`` of each other
    (``id_a < id_b``; self-pairs excluded)."""
    out = radius_join(points, points, id_col, id_col, radius, x_col, y_col)
    return out.where(F.col("id_a") < F.col("id_b"))
