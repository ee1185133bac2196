"""CSV scan with explicit schema and messy-date repair.

The reference reads newspaper metadata CSV with header inference
(``etl_textreuse/assets/upstream_metadata.py:18-21``) and then repairs
malformed dates like ``1732-00-00`` with a substring/CASE fallback chain
(``:25-38``). Here the schema is explicit (inference is a correctness
and performance hazard at scale: it double-reads the file) and the date
repair is a reusable column function (see functions/dates.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
    **options,
) -> DataFrame:
    reader = spark.read.option("header", header)
    for k, v in options.items():
        reader = reader.option(k, v)
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    return reader.schema(schema).csv(path)
