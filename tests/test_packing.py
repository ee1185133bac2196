"""Sequence packing (operators/packing.py): strict next-fit guarantees,
strategy agreement, determinism. The cumsum strategy's exact assignment
is value-hash-gated by the sequence_packing contract query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.packing import (
    pack_sequences,
    pack_utilization,
)

BUDGET = 100


@pytest.fixture(scope="module")
def sized(spark):
    rows = [(i, 5 + (i * 37) % 60) for i in range(500)]
    rows.append((1000, 400))  # oversized: must get its own pack
    return spark.createDataFrame(rows, "doc_id long, size long")


def test_nextfit_never_exceeds_budget(spark, sized):
    packs = pack_sequences(sized, "doc_id", "size", BUDGET, num_shards=8,
                           strategy="nextfit")
    util = pack_utilization(packs, BUDGET)
    over = util.filter(
        (F.col("tokens") > BUDGET) & (F.col("n_docs") > 1)
    ).count()
    assert over == 0  # only single oversized docs may exceed
    # every document packed exactly once
    assert packs.count() == sized.count()
    assert packs.select("doc_id").distinct().count() == sized.count()
    # the oversized doc sits alone
    big = packs.filter(F.col("doc_id") == 1000).collect()[0]
    alone = packs.filter(
        (F.col("shard") == big.shard) & (F.col("pack_id") == big.pack_id)
    ).count()
    assert alone == 1


def test_cumsum_overshoot_bounded_by_one_doc(spark, sized):
    packs = pack_sequences(sized, "doc_id", "size", BUDGET, num_shards=8)
    util = pack_utilization(packs, BUDGET)
    max_doc = sized.agg(F.max("size")).collect()[0][0]
    worst = util.filter(F.col("n_docs") > 1).agg(F.max("tokens")).collect()[0][0]
    assert worst is None or worst < BUDGET + max_doc


def test_packing_deterministic_under_repartition(spark, sized):
    for strategy in ("cumsum", "nextfit"):
        a = sorted(
            (r.doc_id, r.shard, r.pack_id)
            for r in pack_sequences(sized, "doc_id", "size", BUDGET,
                                    strategy=strategy).collect()
        )
        b = sorted(
            (r.doc_id, r.shard, r.pack_id)
            for r in pack_sequences(sized.repartition(13), "doc_id", "size",
                                    BUDGET, strategy=strategy).collect()
        )
        assert a == b, strategy


def test_nextfit_utilization_not_pathological(spark, sized):
    """Size-desc next-fit should fill packs reasonably — mean fill of
    multi-doc packs above 60% on this distribution."""
    packs = pack_sequences(sized, "doc_id", "size", BUDGET, num_shards=4,
                           strategy="nextfit")
    util = pack_utilization(packs, BUDGET).filter(F.col("n_docs") > 1)
    mean = util.agg(F.avg("utilization")).collect()[0][0]
    assert mean is not None and mean > 0.6


def test_budget_validation(spark, sized):
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(sized, "doc_id", "size", 0)
    with pytest.raises(ValueError, match="strategy"):
        pack_sequences(sized, "doc_id", "size", 10, strategy="nope")


def test_write_training_shards_round_trip(spark, sized, tmp_path):
    from hpc_hd_textreuse_etl_spark.operators.packing import write_training_shards

    path = str(tmp_path / "shards")
    back = write_training_shards(sized, path, num_shards=4, shard_by="doc_id")
    assert back.count() == sized.count()
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in sized.collect()
    )
    import glob
    dirs = sorted(glob.glob(f"{path}/shard_id=*"))
    assert len(dirs) == 4  # one directory per shard
    for d in dirs:
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1  # one file each
    # shard membership is the deterministic hash, restored on read-back
    import pyspark.sql.functions as F2
    mismatch = back.filter(
        F2.pmod(F2.xxhash64("doc_id"), F2.lit(4)) != F2.col("shard_id")
    ).count()
    assert mismatch == 0
