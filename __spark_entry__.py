"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (each takes ``(spark, sf_dir)``); ``oracle_sql()`` gives
the DuckDB-equivalent SQL for the hash-match correctness gate.
All three delegate to the engine's query registry
(``hpc_hd_textreuse_etl_spark/plans/queries.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary) on sf0.001."""
    return QUERIES["pricing_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
