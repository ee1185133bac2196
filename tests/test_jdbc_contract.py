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


def test_load_table_timing_fields_measure_their_phases(
    spark, fake_target, monkeypatch
):
    """The {rows, load_seconds, index_seconds} triple is the reference's
    per-load metadata (spark_utils.py:281-291): each timer must bracket
    its OWN phase — a slow write lands in load_seconds, slow index DDL
    in index_seconds, not vice versa."""
    import time

    df = spark.range(5).withColumnRenamed("id", "x")
    monkeypatch.setattr(
        jdbc_sink, "write_jdbc", lambda *a, **k: time.sleep(0.25)
    )

    def slow_sql(sql):
        if sql.startswith("CREATE INDEX"):
            time.sleep(0.15)

    out = jdbc_sink.load_table(
        df,
        fake_target,
        "t",
        indexes=["CREATE INDEX ix ON t(x)"],
        execute_sql=slow_sql,
    )
    assert isinstance(out["load_seconds"], float)
    assert isinstance(out["index_seconds"], float)
    assert out["load_seconds"] >= 0.25
    assert 0.15 <= out["index_seconds"] < 0.25  # index timer excludes the write


def test_load_table_count_mismatch_raises(spark, fake_target, monkeypatch):
    df = spark.range(7).withColumnRenamed("id", "x")
    monkeypatch.setattr(jdbc_sink, "write_jdbc", lambda *a, **k: None)
    with pytest.raises(jdbc_sink.LoadVerificationError, match="database has 3"):
        jdbc_sink.load_table(
            df, fake_target, "t", fetch_count=lambda sql: 3
        )
