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


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.sketches import (  # noqa: E402
    cms_lookup,
    cms_merge,
    cms_sketch,
)


def _items_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], "item string")


def test_cms_never_underestimates(spark):
    vals = [f"k{i % 37}" for i in range(1000)]
    df = _items_df(spark, vals)
    sketch = cms_sketch(df, "item", width=16, depth=3)  # tiny → collisions
    items = df.distinct()
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_lookup(sketch, items, "item", width=16, depth=3).collect()
    }
    from collections import Counter

    exact = Counter(vals)
    assert set(est) == set(exact)
    for k, c in exact.items():
        assert est[k] >= c, f"{k}: estimate {est[k]} < exact {c}"


def test_cms_exact_when_wide(spark):
    vals = [f"k{i % 5}" for i in range(100)]
    df = _items_df(spark, vals)
    sketch = cms_sketch(df, "item", width=4096, depth=4)
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_lookup(sketch, df.distinct(), "item", width=4096, depth=4).collect()
    }
    assert est == {"k0": 20, "k1": 20, "k2": 20, "k3": 20, "k4": 20}


def test_cms_merge_is_linear(spark):
    a = _items_df(spark, [f"a{i % 11}" for i in range(300)])
    b = _items_df(spark, [f"a{i % 7}" for i in range(200)])
    merged = cms_merge(
        cms_sketch(a, "item", width=32, depth=3),
        cms_sketch(b, "item", width=32, depth=3),
    )
    whole = cms_sketch(a.unionByName(b), "item", width=32, depth=3)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_weighted(spark):
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)], "item string, w int")
    sketch = cms_sketch(df, "item", width=1024, depth=4, weight_col="w")
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_lookup(sketch, df.select("item").distinct(), "item",
                            width=1024, depth=4).collect()
    }
    assert est["x"] == 12 and est["y"] == 1


def test_cms_missing_item_estimates_from_zero_cells(spark):
    df = _items_df(spark, ["only"])
    sketch = cms_sketch(df, "item", width=1024, depth=4)
    probe = _items_df(spark, ["absent"])
    [row] = cms_lookup(sketch, probe, "item", width=1024, depth=4).collect()
    assert row["cms_estimate"] == 0  # untouched cells coalesce to 0


# ---------------------------------------------------------------------------
# Quantile sketch (hash-gated sample + type-1 quantiles)
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.sketches import (  # noqa: E402
    quantile_sketch,
    quantiles_from_sketch,
)


def _vals_df(spark, n=200):
    return spark.createDataFrame(
        [(i, float((i * 37) % n)) for i in range(n)], "rid bigint, v double"
    ).withColumn("g", F.lit("all"))


def test_quantile_full_sample_is_exact(spark):
    n = 200
    sk = quantile_sketch(
        _vals_df(spark, n), ["g"], "v", sample_key_cols=["rid"], fraction=1.0
    )
    out = {
        r["quantile"]: r["value"]
        for r in quantiles_from_sketch(
            sk, ["g"], "v", qs=(0.5, 0.9), tiebreak_cols=("rid",)
        ).collect()
    }
    # values are a permutation of 0..199 → type-1 quantiles are exact ranks
    assert out[0.5] == 99.0  # ceil(0.5*200)=100th smallest = 99
    assert out[0.9] == 179.0


def test_quantile_sample_deterministic_under_repartition(spark):
    df = _vals_df(spark)
    a = quantile_sketch(df, ["g"], "v", ["rid"], fraction=0.3)
    b = quantile_sketch(df.repartition(13), ["g"], "v", ["rid"], fraction=0.3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quantile_sketch_merges_by_union(spark):
    df = _vals_df(spark)
    half1 = df.where(F.col("rid") < 100)
    half2 = df.where(F.col("rid") >= 100)
    merged = quantile_sketch(half1, ["g"], "v", ["rid"], fraction=0.4).unionByName(
        quantile_sketch(half2, ["g"], "v", ["rid"], fraction=0.4)
    )
    whole = quantile_sketch(df, ["g"], "v", ["rid"], fraction=0.4)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_cms_fast_family_same_guarantees(spark):
    """The xxhash64 production path keeps the overestimate invariant and
    merge linearity (values differ from the portable path; properties
    must not)."""
    vals = [f"k{i % 23}" for i in range(400)]
    df = _items_df(spark, vals)
    sketch = cms_sketch(df, "item", width=16, depth=3, hash_family="fast")
    est = {
        r["item"]: r["cms_estimate"]
        for r in cms_lookup(
            sketch, df.distinct(), "item", width=16, depth=3, hash_family="fast"
        ).collect()
    }
    from collections import Counter

    for k, c in Counter(vals).items():
        assert est[k] >= c


def test_cms_rejects_unknown_family(spark):
    import pytest

    df = _items_df(spark, ["x"])
    with pytest.raises(ValueError, match="hash_family"):
        cms_sketch(df, "item", hash_family="sha512").collect()


# ---------------------------------------------------------------------------
# HyperLogLog (portable registers)
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.sketches import (  # noqa: E402
    bloom_bits,
    bloom_contains,
    bloom_merge,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def test_hll_estimate_within_expected_error(spark):
    n = 20_000
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))
    sk = hll_registers(df, "v", p=9)
    est = hll_estimate(sk, p=9)
    # stderr ≈ 1.04/sqrt(512) ≈ 4.6%; allow 3σ
    assert abs(est - n) / n < 0.15


def test_hll_small_range_linear_counting(spark):
    df = spark.range(30).select(F.col("id").cast("string").alias("v"))
    est = hll_estimate(hll_registers(df, "v", p=9), p=9)
    assert abs(est - 30) / 30 < 0.25


def test_hll_merge_equals_union_sketch(spark):
    a = spark.range(0, 5000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2500, 9000).select(F.col("id").cast("string").alias("v"))
    merged = hll_merge(hll_registers(a, "v"), hll_registers(b, "v"))
    direct = hll_registers(a.union(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_hll_duplicates_do_not_move_registers(spark):
    a = spark.range(1000).select(F.col("id").cast("string").alias("v"))
    dup = a.union(a).union(a)
    assert sorted(map(tuple, hll_registers(dup, "v").collect())) == sorted(
        map(tuple, hll_registers(a, "v").collect())
    )


# ---------------------------------------------------------------------------
# Bloom filter (portable bitmap)
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_low_fp(spark):
    members = spark.range(0, 500).select(F.col("id").cast("string").alias("v"))
    bloom = bloom_bits(members, "v", m_bits=1 << 14, k=5)
    probes = spark.range(0, 2000).select(F.col("id").alias("x"))
    got = {
        r.x: r.might_contain
        for r in bloom_contains(probes, "x", bloom, m_bits=1 << 14, k=5).collect()
    }
    assert all(got[i] for i in range(500)), "false negative!"
    fp = sum(1 for i in range(500, 2000) if got[i])
    # 500 elements in 16384 bits, k=5 → fp ≈ 0.1%; 1500 probes → expect ~2
    assert fp < 25


def test_bloom_merge_equals_union_build(spark):
    a = spark.range(0, 300).select(F.col("id").cast("string").alias("v"))
    b = spark.range(200, 600).select(F.col("id").cast("string").alias("v"))
    merged = bloom_merge(bloom_bits(a, "v"), bloom_bits(b, "v"))
    direct = bloom_bits(a.union(b), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_probe_plan_broadcasts_bitmap(spark):
    members = spark.range(100).select(F.col("id").cast("string").alias("v"))
    bloom = bloom_bits(members, "v")
    probes = spark.range(1000).select(F.col("id").alias("x"))
    plan = (
        bloom_contains(probes, "x", bloom)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# bloom_prune / bloom_pruned_join — zero-shuffle semi-join reduction.
# Full-join equivalence on real tables is value-hash-gated via
# bloom_pruned_supplier_join (test_oracle_parity).
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.sketches import (
    bloom_bits,
    bloom_prune,
    bloom_pruned_join,
)


def test_bloom_prune_no_false_negatives_and_multiplicity(spark):
    keys = spark.createDataFrame([(k,) for k in (5, 9, 14)], "k long")
    bloom = bloom_bits(keys, "k", m_bits=1 << 12, k=4)
    # duplicate fact rows must survive with multiplicity intact
    fact = spark.createDataFrame(
        [(5, "a"), (5, "b"), (9, "c"), (100, "x"), (200, "y")],
        "k long, payload string",
    )
    kept = bloom_prune(fact, "k", bloom, m_bits=1 << 12, k=4).collect()
    kept_keys = [r.k for r in kept]
    for want in (5, 5, 9):  # all true members, duplicates preserved
        assert want in kept_keys
        kept_keys.remove(want)
    # whatever remains are (rare) false positives from {100, 200}
    assert all(k in (100, 200) for k in kept_keys)


def test_bloom_pruned_join_equals_plain_join(spark):
    import random

    rng = random.Random(3)
    fact = spark.createDataFrame(
        [(rng.randrange(50), i) for i in range(400)], "k long, v long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(0, 50, 7)], "dk long, tag string"
    )
    plain = sorted(
        (r.k, r.v, r.tag)
        for r in fact.join(dim, fact["k"] == dim["dk"]).collect()
    )
    pruned = sorted(
        (r.k, r.v, r.tag)
        for r in bloom_pruned_join(fact, dim, "k", "dk").collect()
    )
    assert pruned == plain


def test_bloom_prune_rejects_oversized_bitmap(spark):
    keys = spark.createDataFrame([(1,)], "k long")
    bloom = bloom_bits(keys, "k", m_bits=1 << 12, k=4)
    import pytest as _pt

    with _pt.raises(ValueError):
        bloom_prune(keys, "k", bloom, m_bits=1 << 21, k=4)


# --- kmv_pairwise_overlap ---------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.sketches import (  # noqa: E402
    kmv_bottom_k,
    kmv_pairwise_overlap,
)


def test_kmv_overlap_exact_when_under_k(spark):
    # sets smaller than k: the sketch IS the set, estimates are exact
    rows = (
        [("A", f"t{i}") for i in range(40)]
        + [("B", f"t{i}") for i in range(20, 80)]   # |B|=60, overlap 20
        + [("C", f"u{i}") for i in range(10)]       # disjoint from A and B
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    sk = kmv_bottom_k(df, ["grp"], "v", k=256)
    out = {
        (r["key_a"], r["key_b"]): r
        for r in kmv_pairwise_overlap(sk, "grp", k=256).collect()
    }
    ab = out[("A", "B")]
    assert (ab["est_a"], ab["est_b"], ab["est_union"]) == (40.0, 60.0, 80.0)
    assert ab["est_intersection"] == 20.0
    assert ab["jaccard"] == 20.0 / 80.0
    ac = out[("A", "C")]
    assert ac["est_intersection"] == 0.0 and ac["jaccard"] == 0.0
    assert len(out) == 3  # unordered pairs only


def test_kmv_overlap_estimates_large_sets(spark):
    # identical large sets: jaccard estimate must be ~1; disjoint: ~0
    rows = [(g, f"v{i}") for g in ("X", "Y") for i in range(5000)]
    rows += [("Z", f"w{i}") for i in range(5000)]
    df = spark.createDataFrame(rows, "grp string, v string")
    sk = kmv_bottom_k(df, ["grp"], "v", k=128)
    out = {
        (r["key_a"], r["key_b"]): r
        for r in kmv_pairwise_overlap(sk, "grp", k=128).collect()
    }
    assert out[("X", "Y")]["jaccard"] == 1.0  # identical hash sets
    assert out[("X", "Z")]["jaccard"] < 0.2
    est = out[("X", "Y")]["est_a"]
    assert abs(est - 5000) / 5000 < 0.3  # ~1/sqrt(k-2) stderr
