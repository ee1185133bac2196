"""Z-order layout: Morton-key correctness, locality/pruning proof,
range guard, writer round-trip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.layout import write_zordered, zorder_key


def interleave_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zorder_matches_reference_bit_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 4095) for y in (0, 2, 7, 1000, 4095)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select("x", "y", zorder_key(["x", "y"], bits=12).alias("z")).collect()
    for r in got:
        assert r.z == interleave_ref(r.x, r.y, 12), (r.x, r.y)


def test_zorder_three_dims_and_validation(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    z = df.select(zorder_key(["a", "b", "c"], bits=10).alias("z")).head().z
    ref = 0
    for b in range(10):
        ref |= ((1 >> b) & 1) << (3 * b)
        ref |= ((2 >> b) & 1) << (3 * b + 1)
        ref |= ((3 >> b) & 1) << (3 * b + 2)
    assert z == ref
    with pytest.raises(ValueError):
        zorder_key(["a"], bits=10)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], bits=32)


def test_zorder_out_of_range_raises_at_runtime(spark):
    df = spark.createDataFrame([(1 << 13, 1)], "x long, y long")
    with pytest.raises(Exception, match="zorder_key"):
        df.select(zorder_key(["x", "y"], bits=12)).collect()
    neg = spark.createDataFrame([(-1, 1)], "x long, y long")
    with pytest.raises(Exception, match="zorder_key"):
        neg.select(zorder_key(["x", "y"], bits=12)).collect()


def _partition_spans(df, sort_col, dims, n):
    """Per-partition (max-min) span of each dim after range-sort."""
    parts = (
        df.repartitionByRange(n, F.col(sort_col))
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            *[F.max(d).alias(f"mx_{d}") for d in dims],
            *[F.min(d).alias(f"mn_{d}") for d in dims],
        )
        .collect()
    )
    return {
        d: sum(getattr(r, f"mx_{d}") - getattr(r, f"mn_{d}") for r in parts)
        / len(parts)
        for d in dims
    }


def test_zorder_tightens_both_dimensions(spark):
    # uniform 128x128 grid; 16 files. Single-column sort: x-span ~8,
    # y-span ~127 (full). Z-order: BOTH spans ~ 128/sqrt(16) = 32.
    grid = (
        spark.range(128 * 128)
        .select(
            (F.col("id") % 128).alias("x"), (F.col("id") / 128).cast("long").alias("y")
        )
        .withColumn("z", zorder_key(["x", "y"], bits=7))
    )
    by_x = _partition_spans(grid, "x", ["x", "y"], 16)
    by_z = _partition_spans(grid, "z", ["x", "y"], 16)
    # single-dim sort: second dimension is a full-range scan, unprunable
    assert by_x["y"] > 100
    # z-order: BOTH dimensions bounded well below the 127 domain span
    # (ideal 128/sqrt(16)=32; sampled range boundaries aren't quadrant-
    # aligned, so allow ~2x the ideal — still a >2x prune on each dim)
    assert by_z["x"] < 64 and by_z["y"] < 64


def test_write_zordered_round_trip_and_file_stats(spark, tmp_path):
    path = str(tmp_path / "zordered")
    df = spark.range(4096).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    write_zordered(df, ["x", "y"], path, n_files=8, bits=6)
    back = spark.read.parquet(path)
    assert back.count() == 4096
    assert set(back.columns) == {"x", "y"}
    # each physical file's x-range must be a fraction of the domain
    spans = (
        back.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg((F.max("x") - F.min("x")).alias("sx"), (F.max("y") - F.min("y")).alias("sy"))
        .collect()
    )
    assert len(spans) >= 4
    assert sum(r.sx for r in spans) / len(spans) < 40
    assert sum(r.sy for r in spans) / len(spans) < 40
