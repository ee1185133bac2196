"""KMV sketch: exactness below k, estimator accuracy, merge associativity
(sketch-of-union == merge-of-sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.sketches import (
    kmv_bottom_k,
    kmv_distinct,
    kmv_estimate_from_sketch,
    kmv_merge,
)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "g string, v long")


def test_exact_below_k(spark):
    df = _df(spark, [("a", i) for i in range(50)] + [("a", i) for i in range(50)])
    got = kmv_distinct(df, ["g"], "v", k=64).collect()
    assert len(got) == 1 and got[0].kmv_estimate == 50.0


def test_estimator_accuracy(spark):
    n = 20_000
    df = spark.range(n).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    est = kmv_distinct(df, ["g"], "v", k=256).collect()[0].kmv_estimate
    assert abs(est - n) / n < 0.2  # stderr ~ 1/sqrt(254) ~ 6%


def test_duplicates_do_not_move_estimate(spark):
    base = [("a", i) for i in range(5000)]
    est1 = kmv_distinct(_df(spark, base), ["g"], "v", k=128).collect()[0].kmv_estimate
    est2 = kmv_distinct(_df(spark, base * 3), ["g"], "v", k=128).collect()[0].kmv_estimate
    assert est1 == est2


def test_merge_equals_sketch_of_union(spark):
    k = 64
    left = _df(spark, [("a", i) for i in range(3000)])
    right = _df(spark, [("a", i) for i in range(1500, 4500)])  # overlap
    merged = kmv_merge(
        kmv_bottom_k(left, ["g"], "v", k=k),
        kmv_bottom_k(right, ["g"], "v", k=k),
        ["g"],
        k=k,
    )
    direct = kmv_bottom_k(left.union(right), ["g"], "v", k=k)
    m = merged.collect()[0].kmv_hashes
    d = direct.collect()[0].kmv_hashes
    assert m == d
    est = kmv_estimate_from_sketch(merged, k=k).collect()[0].kmv_estimate
    assert abs(est - 4500) / 4500 < 0.35


def test_merge_disjoint_keys_full_outer(spark):
    k = 8
    a = kmv_bottom_k(_df(spark, [("a", i) for i in range(4)]), ["g"], "v", k=k)
    b = kmv_bottom_k(_df(spark, [("b", i) for i in range(5)]), ["g"], "v", k=k)
    out = {r.g: r.kmv_estimate for r in kmv_estimate_from_sketch(kmv_merge(a, b, ["g"], k=k), k=k).collect()}
    assert out == {"a": 4.0, "b": 5.0}
