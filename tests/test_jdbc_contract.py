"""JDBC load contract (S8) without a database: DDL ordering, count
assert, index-after-load — the control flow is the contract."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.sources import jdbc_sink


@pytest.fixture()
def fake_target():
    return jdbc_sink.JdbcTarget(
        url="jdbc:fake://x", driver="org.fake.Driver", user="u", password="p"
    )


def test_load_table_contract_order_and_metrics(spark, fake_target, monkeypatch):
    df = spark.range(7).withColumnRenamed("id", "x")
    events = []
    monkeypatch.setattr(
        jdbc_sink, "write_jdbc", lambda *a, **k: events.append("write")
    )
    out = jdbc_sink.load_table(
        df,
        fake_target,
        "t",
        ddl="CREATE TABLE t (x BIGINT)",
        indexes=["CREATE INDEX ix ON t(x)"],
        execute_sql=lambda sql: events.append(f"sql:{sql.split()[0]}"),
        fetch_count=lambda sql: (events.append("count"), 7)[1],
    )
    # DDL before write, count check after write, indexes last
    assert events == ["sql:CREATE", "write", "count", "sql:CREATE"]
    assert out["rows"] == 7
    assert "load_seconds" in out and "index_seconds" in out


def test_load_table_count_mismatch_raises(spark, fake_target, monkeypatch):
    df = spark.range(7).withColumnRenamed("id", "x")
    monkeypatch.setattr(jdbc_sink, "write_jdbc", lambda *a, **k: None)
    with pytest.raises(jdbc_sink.LoadVerificationError, match="database has 3"):
        jdbc_sink.load_table(
            df, fake_target, "t", fetch_count=lambda sql: 3
        )
