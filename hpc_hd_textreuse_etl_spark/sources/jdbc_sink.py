"""JDBC bulk-load sink with the reference's load contract.

Mirrors ``etl_textreuse/spark_utils.py:233-292`` (``jdbc_opts`` +
``load_table``): DDL (drop/create + engine options), batched JDBC write,
row-count verification, then index creation — indexes AFTER load, which
is the only sane order for bulk loads. The DB is optional: everything is
injected (DDL executor callable, JDBC URL), and nothing here imports a
driver at module level, so the engine runs without any database
installed.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

DEFAULT_BATCH_SIZE = 100_000


@dataclass
class JdbcTarget:
    url: str  # jdbc:mysql://... / jdbc:postgresql://...
    driver: str
    user: str
    password: str
    properties: dict[str, str] = field(default_factory=dict)


class LoadVerificationError(RuntimeError):
    pass


def write_jdbc(
    df: DataFrame,
    target: JdbcTarget,
    table: str,
    batch_size: int = DEFAULT_BATCH_SIZE,
    mode: str = "append",
) -> None:
    (
        df.write.format("jdbc")
        .option("url", target.url)
        .option("driver", target.driver)
        .option("dbtable", table)
        .option("user", target.user)
        .option("password", target.password)
        .option("batchsize", batch_size)
        .options(**target.properties)
        .mode(mode)
        .save()
    )


def load_table(
    df: DataFrame,
    target: JdbcTarget,
    table: str,
    ddl: str | None = None,
    indexes: list[str] | None = None,
    execute_sql: Callable[[str], object] | None = None,
    count_sql: str | None = None,
    fetch_count: Callable[[str], int] | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
) -> dict[str, object]:
    """Full load contract: DDL → bulk write → count assert → indexes.

    ``execute_sql`` / ``fetch_count`` abstract the control connection
    (sqlalchemy, raw driver, …) so this module has no DB dependency.
    Returns ``{rows, load_seconds, index_seconds}`` — the reference's
    per-load metadata (``spark_utils.py:281-291``).
    """
    if ddl and execute_sql:
        execute_sql(ddl)

    t0 = time.perf_counter()
    spark_count = df.count()
    write_jdbc(df, target, table, batch_size=batch_size, mode="append")
    load_seconds = time.perf_counter() - t0

    if fetch_count:
        db_count = fetch_count(count_sql or f"SELECT COUNT(*) FROM {table}")
        if db_count != spark_count:
            raise LoadVerificationError(
                f"{table}: database has {db_count} rows, Spark wrote {spark_count}"
            )

    t0 = time.perf_counter()
    if indexes and execute_sql:
        for idx_sql in indexes:
            execute_sql(idx_sql)
    index_seconds = time.perf_counter() - t0

    return {
        "rows": spark_count,
        "load_seconds": round(load_seconds, 3),
        "index_seconds": round(index_seconds, 3),
    }
