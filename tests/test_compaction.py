"""Streaming state compaction (streaming/compaction.py): read-back
equality pre/post, count-partial folding, crash-recovery of the
compaction itself, the committed-batch precondition, and — the reason
the replay rule exists — a genuine Structured Streaming crash-replay
(delete the last commit record, restart on the same checkpoint) AFTER
compaction converging to the batch pipeline's answer."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.streaming.compaction import (
    batch_ids,
    compact_span_state,
    compact_state,
    compact_streaming_spans,
    last_committed_batch,
    recover_compaction,
)




def _uncommit(ckpt: str, batch_id: int) -> None:
    """Simulate the crash window the replay rule covers: the sink wrote
    batch N but its commit record never landed. Hadoop's local
    ChecksumFs keeps a .crc sibling next to every file — it must go too
    or the engine's rename-based rewrite of the commit fails."""
    for name in (str(batch_id), f".{batch_id}.crc"):
        f = os.path.join(ckpt, "commits", name)
        if os.path.exists(f):
            os.remove(f)

def _ingest_chunks(spark, tmp_path, chunks):
    src = str(tmp_path / "docs")
    for chunk in chunks:
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)
    return src


def _run_span_stream(spark, src, tmp_path, ckpt_name):
    from hpc_hd_textreuse_etl_spark.streaming.sinks import streaming_span_dedup

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_span_dedup(
        stream,
        state_path=str(tmp_path / "state"),
        spans_path=str(tmp_path / "spans"),
        checkpoint=str(tmp_path / ckpt_name),
        window=4,
    )
    q.awaitTermination()


SPAN_CHUNKS = [
    [(1, "alpha beta gamma delta epsilon zeta eta theta"),
     (2, "alpha beta gamma delta epsilon zeta other two")],
    [(10, "epsilon zeta eta theta trailing words here now"),
     (12, "clean doc with no repeats at all whatsoever today")],
    [(11, "rep one two three rep one two three end pad")],
]


def test_span_state_compaction_preserves_readback_and_survives_replay(
    spark, tmp_path
):
    from hpc_hd_textreuse_etl_spark.operators.dedup import duplicated_token_spans
    from hpc_hd_textreuse_etl_spark.streaming.sinks import read_streaming_spans

    src = _ingest_chunks(spark, tmp_path, SPAN_CHUNKS)
    _run_span_stream(spark, src, tmp_path, "ckpt")
    state, spans, ckpt = (
        str(tmp_path / "state"), str(tmp_path / "spans"), str(tmp_path / "ckpt")
    )
    assert last_committed_batch(spark, ckpt) == 2

    all_docs = spark.createDataFrame(
        [d for c in SPAN_CHUNKS for d in c], "doc_id long, text string"
    )
    want = {
        tuple(r)
        for r in duplicated_token_spans(all_docs, "doc_id", "text", window=4).collect()
    }
    counts_pre = {
        (r.k, r.n)
        for r in spark.read.option("basePath", os.path.join(state, "counts"))
        .parquet(os.path.join(state, "counts"))
        .groupBy("k").agg(F.sum("n_occurrences").alias("n")).collect()
    }
    windows_pre = {
        tuple(r)
        for r in spark.read.option("basePath", os.path.join(state, "windows"))
        .parquet(os.path.join(state, "windows")).drop("batch_id").collect()
    }

    compact_span_state(spark, state, upto_batch=2, checkpoint=ckpt)
    compact_streaming_spans(spark, spans, upto_batch=2, checkpoint=ckpt)

    # partitions 0,1 merged into 1; live tail (2) untouched
    assert batch_ids(spark, os.path.join(state, "windows")) == [1, 2]
    assert batch_ids(spark, os.path.join(state, "counts")) == [1, 2]
    assert batch_ids(spark, spans) == [1, 2]
    # count partials folded: at most one row per key within the
    # consolidated partition, and every summed count unchanged
    folded = spark.read.parquet(os.path.join(state, "counts", "batch_id=1"))
    assert folded.groupBy("k").count().filter("count > 1").count() == 0
    counts_post = {
        (r.k, r.n)
        for r in spark.read.option("basePath", os.path.join(state, "counts"))
        .parquet(os.path.join(state, "counts"))
        .groupBy("k").agg(F.sum("n_occurrences").alias("n")).collect()
    }
    assert counts_post == counts_pre
    windows_post = {
        tuple(r)
        for r in spark.read.option("basePath", os.path.join(state, "windows"))
        .parquet(os.path.join(state, "windows")).drop("batch_id").collect()
    }
    assert windows_post == windows_pre
    got = {tuple(r) for r in read_streaming_spans(spark, spans).collect()}
    assert got == want

    # crash-replay the live tail: drop batch 2's commit record (the
    # exact crash window the replay rule covers — sink wrote, commit
    # didn't land) and restart on the SAME checkpoint. Batch 2 re-runs
    # against base `batch_id < 2`, which is now the consolidated
    # partition, and must converge to the identical span table.
    _uncommit(ckpt, 2)
    _run_span_stream(spark, src, tmp_path, "ckpt")
    assert last_committed_batch(spark, ckpt) == 2
    again = {tuple(r) for r in read_streaming_spans(spark, spans).collect()}
    assert again == want


def test_minhash_state_compaction_preserves_pairs_and_survives_replay(
    spark, tmp_path
):
    from hpc_hd_textreuse_etl_spark.operators.dedup import minhash_near_duplicates
    from hpc_hd_textreuse_etl_spark.streaming.compaction import (
        compact_minhash_state,
    )
    from hpc_hd_textreuse_etl_spark.streaming.sinks import streaming_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    chunks = [
        [(1, base), (2, base)],
        [(3, base.replace("quick", "swift")),
         (5, "completely different content about spark shuffle partitions")],
        [(4, base.replace("today", "tomorrow morning")),
         (6, "another unrelated text entirely about catalyst rules")],
    ]
    src = _ingest_chunks(spark, tmp_path, chunks)
    sigs, pairs, ckpt = (
        str(tmp_path / "sigs"), str(tmp_path / "pairs"), str(tmp_path / "ckpt")
    )

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(
            stream, sigs_path=sigs, pairs_path=pairs, checkpoint=ckpt,
            threshold=0.5,
        )
        q.awaitTermination()

    run()
    want = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            spark.createDataFrame(
                [d for c in chunks for d in c], "doc_id long, text string"
            ),
            "doc_id", "text", threshold=0.5,
        ).collect()
    }

    compact_minhash_state(spark, sigs, pairs, upto_batch=2, checkpoint=ckpt)
    assert batch_ids(spark, sigs) == [1, 2]
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.option("basePath", pairs).parquet(pairs).collect()
    }
    assert got == want

    _uncommit(ckpt, 2)
    run()
    again = {
        (r.id_a, r.id_b)
        for r in spark.read.option("basePath", pairs).parquet(pairs).collect()
    }
    assert again == want


def _write_batches(spark, path, rows_by_batch):
    for bid, rows in rows_by_batch.items():
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(path, f"batch_id={bid}"))


def test_compact_state_refuses_uncommitted_upto(spark, tmp_path):
    path = str(tmp_path / "tree")
    _write_batches(spark, path, {0: [(1, 1)], 1: [(2, 2)], 2: [(3, 3)]})
    ckpt = tmp_path / "ckpt" / "commits"
    ckpt.mkdir(parents=True)
    (ckpt / "0").write_text("v1")
    (ckpt / "1").write_text("v1")
    with pytest.raises(ValueError, match="committed"):
        compact_state(spark, path, upto_batch=2, checkpoint=str(tmp_path / "ckpt"))
    # at the committed frontier it proceeds
    assert compact_state(
        spark, path, upto_batch=1, checkpoint=str(tmp_path / "ckpt")
    ) == 0  # only one partition below upto — nothing to merge


def test_compaction_recovery_completes_or_discards(spark, tmp_path):
    """Crash during step 1 (no _SUCCESS in the hidden temp) → temp is
    discarded, originals intact. Crash during step 2 (complete temp,
    originals partially deleted) → commit is finished."""
    path = str(tmp_path / "tree")
    _write_batches(spark, path, {0: [(1, 1)], 1: [(2, 2)], 2: [(3, 3)]})

    # incomplete temp: parquet rows but the _SUCCESS marker removed
    tmp = os.path.join(path, "_compacting_2")
    spark.createDataFrame([(9, 9)], "k long, v long").write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    assert recover_compaction(spark, path) is False
    assert not os.path.exists(tmp)
    assert batch_ids(spark, path) == [0, 1, 2]

    # complete temp + one original already deleted mid-commit
    consolidated = (
        spark.read.option("basePath", path)
        .parquet(os.path.join(path, "batch_id=0"), os.path.join(path, "batch_id=1"))
        .drop("batch_id")
    )
    consolidated.write.parquet(tmp)
    import shutil

    shutil.rmtree(os.path.join(path, "batch_id=0"))
    assert recover_compaction(spark, path) is True
    assert batch_ids(spark, path) == [1, 2]
    rows = {
        (r.k, r.v)
        for r in spark.read.option("basePath", path).parquet(path)
        .drop("batch_id").collect()
    }
    assert rows == {(1, 1), (2, 2), (3, 3)}

    # recovery is also idempotent-on-clean and wired into compact_state
    assert recover_compaction(spark, path) is False
    assert compact_state(spark, path, upto_batch=3) == 2
    assert batch_ids(spark, path) == [2]


def test_compact_state_fold_must_drop_batch_id(spark, tmp_path):
    path = str(tmp_path / "tree")
    _write_batches(spark, path, {0: [(1, 1)], 1: [(2, 2)]})
    with pytest.raises(ValueError, match="batch_id"):
        compact_state(spark, path, upto_batch=2, fold=lambda df: df)
