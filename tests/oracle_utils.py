"""Local replica of the driver's Spark-vs-DuckDB comparison gate."""

from __future__ import annotations

import math

import duckdb

from hpc_hd_textreuse_etl_spark.catalog import TESTDATA_TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def normalized_rows(columns, rows):
    """Sort columns by name, then rows — order-insensitive comparison."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(columns), sorted(out, key=lambda t: tuple(str(x) for x in t))


def compare_spark_duckdb(spark_df, con, sql: str):
    """Return (ok, message). Exact value equality — the engine is designed
    for bit-identical results (decimal-exact sums, IEEE per-row ops)."""
    sdata = spark_df.collect()
    scols = spark_df.columns
    srows = [tuple(row) for row in sdata]

    res = con.execute(sql)
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    scols_s, srows_s = normalized_rows(scols, srows)
    dcols_s, drows_s = normalized_rows(dcols, drows)

    if scols_s != dcols_s:
        return False, f"column mismatch: spark={scols_s} duckdb={dcols_s}"
    if len(srows_s) != len(drows_s):
        return False, f"row count mismatch: spark={len(srows_s)} duckdb={len(drows_s)}"
    for i, (a, b) in enumerate(zip(srows_s, drows_s)):
        if a != b:
            return False, f"row {i} mismatch:\n  spark : {a}\n  duckdb: {b}"
    return True, "ok"
