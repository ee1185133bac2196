"""Recipe registry: topological materialization, resume-if-absent,
cycle detection."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hpc_hd_textreuse_etl_spark.plans.registry import CycleError, Registry


def _make_registry(calls):
    reg = Registry()

    @reg.add("base")
    def base(spark):
        calls.append("base")
        return spark.range(10).withColumnRenamed("id", "x")

    @reg.add("doubled", deps=["base"])
    def doubled(spark, base):
        calls.append("doubled")
        return base.select((F.col("x") * 2).alias("y"))

    @reg.add("summed", deps=["doubled", "base"])
    def summed(spark, doubled, base):
        calls.append("summed")
        return doubled.crossJoin(base.select(F.sum("x").alias("total")))

    return reg


def test_topological_order_and_build(spark, tmp_path):
    calls = []
    reg = _make_registry(calls)
    assert reg.order(["summed"]) == ["base", "doubled", "summed"]
    out = reg.materialise(spark, str(tmp_path), ["summed"])
    assert calls == ["base", "doubled", "summed"]
    assert out["summed"].count() == 10
    assert spark.table("doubled").count() == 10  # views registered


def test_resume_skips_existing(spark, tmp_path):
    calls = []
    reg = _make_registry(calls)
    reg.materialise(spark, str(tmp_path), ["doubled"])
    calls.clear()
    reg2 = _make_registry(calls)
    reg2.materialise(spark, str(tmp_path), ["summed"])
    assert calls == ["summed"]  # base + doubled reused from disk


def test_partial_snapshot_rebuilt(spark, tmp_path):
    """A crashed write (directory without _SUCCESS) must be rebuilt, not
    trusted."""
    calls = []
    reg = _make_registry(calls)
    reg.materialise(spark, str(tmp_path), ["base"])
    # simulate a crashed write: remove the success marker
    (tmp_path / "base.parquet" / "_SUCCESS").unlink()
    calls.clear()
    reg2 = _make_registry(calls)
    out = reg2.materialise(spark, str(tmp_path), ["base"])
    assert calls == ["base"]  # rebuilt
    assert out["base"].count() == 10


def test_cycle_detection(spark):
    reg = Registry()
    reg.add("a", deps=["b"], builder=lambda spark, b: b)
    reg.add("b", deps=["a"], builder=lambda spark, a: a)
    with pytest.raises(CycleError):
        reg.order(["a"])


def test_unknown_dep(spark):
    reg = Registry()
    reg.add("a", deps=["ghost"], builder=lambda spark, ghost: ghost)
    with pytest.raises(KeyError, match="ghost"):
        reg.order(["a"])
