"""Dense-id assignment: both strategies must produce identical dense,
stable, order-preserving ids."""

from __future__ import annotations

import pyspark.sql.functions as F

from hpc_hd_textreuse_etl_spark.functions.ids import (
    dense_ids,
    with_int_id,
    zip_with_index,
)


def test_zip_with_index_preserves_sorted_order(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") * 37 % 10_000).alias("k")
    ).repartition(8)
    out = zip_with_index(df.orderBy("k"), id_col="rid")
    rows = out.orderBy("rid").collect()
    assert [r.rid for r in rows[:3]] == [1, 2, 3]
    assert len(rows) == 10_000
    # ids dense 1..N and aligned with sort order
    ks = [r.k for r in rows]
    assert ks == sorted(ks)
    assert rows[-1].rid == 10_000


def test_dense_ids_strategies_agree(spark):
    df = spark.createDataFrame(
        [(f"v{i:04d}",) for i in range(500)], "val string"
    ).repartition(7)
    w = {(r.val, r.i) for r in dense_ids(df, ["val"], "i", use_window=True).collect()}
    z = {(r.val, r.i) for r in dense_ids(df, ["val"], "i", use_window=False).collect()}
    assert w == z
    assert {i for _, i in w} == set(range(1, 501))


def test_with_int_id_mapping(spark):
    df = spark.createDataFrame(
        [("b", 1), ("a", 2), ("b", 3)], "name string, x int"
    )
    rekeyed, mapping = with_int_id(df, "name", keep_value=True)
    m = {r.name: r.name_id for r in mapping.collect()}
    assert m == {"a": 1, "b": 2}  # sorted order → dense ids
    assert {(r.name, r.name_id) for r in rekeyed.collect()} == {
        ("b", 2),
        ("a", 1),
        ("b", 2),
    }


def test_dense_ids_auto_strategy_is_honest(spark, tmp_path):
    """Round-8 ADVICE/VERDICT item: ``use_window=None`` must be a real
    decision, not a hard-coded window. Small file-backed input (known
    small stats) → window; huge estimated input or NO estimate →
    parallel zip path — unknown size can never silently become a
    single-task global window."""
    from pyspark.sql import functions as F

    from hpc_hd_textreuse_etl_spark.functions.ids import (
        WINDOW_MAX_BYTES,
        plan_size_bytes,
    )

    small_path = str(tmp_path / "small.parquet")
    spark.createDataFrame(
        [(f"v{i:04d}",) for i in range(500)], "val string"
    ).write.parquet(small_path)
    small = spark.read.parquet(small_path)
    assert plan_size_bytes(small) <= WINDOW_MAX_BYTES

    huge = spark.range(10**10).select(F.col("id").alias("val"))
    assert plan_size_bytes(huge) > WINDOW_MAX_BYTES

    unknown = spark.createDataFrame([("a",)], "val string")
    assert plan_size_bytes(unknown) > WINDOW_MAX_BYTES  # Long.MaxValue

    # auto on the small input takes the window plan (a Window node,
    # no monotonically_increasing_id); auto on the unknown-size input
    # takes the zip path (no Window node)
    auto_small = dense_ids(small, ["val"], "i")
    assert "Window" in auto_small._jdf.queryExecution().executedPlan().toString()
    auto_unknown = dense_ids(unknown, ["val"], "i")
    assert "Window" not in auto_unknown._jdf.queryExecution().executedPlan().toString()
    # and the auto result is identical to both explicit strategies
    w = {(r.val, r.i) for r in dense_ids(small, ["val"], "i", use_window=True).collect()}
    assert {(r.val, r.i) for r in auto_small.collect()} == w


def test_zip_checkpoint_release_frees_pinned_blocks(spark):
    """ADVICE item: zip_with_index's eager localCheckpoint pins a copy of
    the input in executor storage that clearCache() cannot see; the
    tracked-release hook must actually free it."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        live_checkpoint_count,
        release_local_checkpoints,
    )

    release_local_checkpoints()  # clean slate (incl. other tests' leftovers)
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([(f"k{i}",) for i in range(1000)], "val string")
    out = dense_ids(df, ["val"], "i", use_window=False)
    assert out.count() == 1000  # materialize the labeled output first
    assert live_checkpoint_count() >= 1
    assert jsc.getPersistentRDDs().size() > before
    spark.catalog.clearCache()  # the blind spot: does NOT free RDD blocks
    assert jsc.getPersistentRDDs().size() > before
    released = release_local_checkpoints()
    assert released >= 1
    assert jsc.getPersistentRDDs().size() == before
    assert live_checkpoint_count() == 0


def test_zip_with_index_stable_under_nondeterministic_upstream(spark):
    """Round-7 regression: the scale path's two jobs (per-partition
    counts, then labeling) must read the SAME materialized partitions.
    Before the localCheckpoint pin, a lazy sort/distinct upstream was
    re-executed per job with freshly-sampled range boundaries, and rows
    near a boundary mislabeled (duplicate + missing ordinals — ~0.8% of
    1.28M defrag targets in the composed-pipeline run). This input's
    emission ORDER changes on every execution; the assigned ids must
    still be exactly the sorted ranks, with no duplicates or gaps."""
    import random

    n = 100_000

    def emit(split, it):
        rows = [(f"k{i:07d}",) for i in range(split, n, 8)]
        # a fresh SystemRandom draw per physical execution — any job
        # re-running this partition sees a different row order
        random.SystemRandom().shuffle(rows)
        return iter(rows)

    rdd = spark.sparkContext.parallelize(range(8), 8).mapPartitionsWithIndex(
        lambda split, it: emit(split, it)
    )
    df = spark.createDataFrame(rdd, "val string")
    out = dense_ids(df, ["val"], "i", use_window=False).collect()
    assert len(out) == n
    ids = sorted(r.i for r in out)
    assert ids == list(range(1, n + 1))  # dense, no dupes, no gaps
    # and each id is the exact sorted rank of its value
    by_val = sorted(out, key=lambda r: r.val)
    assert all(r.i == rank + 1 for rank, r in enumerate(by_val))
