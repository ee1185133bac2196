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
    """Crash during step 1 (no completion marker in the hidden temp) →
    temp is discarded, originals intact. Crash during step 2 (marked
    temp, originals partially deleted) → commit is finished. The marker
    is compaction-owned (_COMPACTION_COMPLETE), NOT Spark's _SUCCESS —
    so a committer configured with marksuccessfuljobs=false can't make a
    complete temp look incomplete: the second phase below deletes
    _SUCCESS from the temp and recovery must still commit it."""
    path = str(tmp_path / "tree")
    _write_batches(spark, path, {0: [(1, 1)], 1: [(2, 2)], 2: [(3, 3)]})

    # incomplete temp: parquet rows written (Spark even left _SUCCESS),
    # but the crash hit before the compaction marker landed
    tmp = os.path.join(path, "_compacting_2")
    spark.createDataFrame([(9, 9)], "k long, v long").write.parquet(tmp)
    assert os.path.exists(os.path.join(tmp, "_SUCCESS"))
    assert recover_compaction(spark, path) is False
    assert not os.path.exists(tmp)
    assert batch_ids(spark, path) == [0, 1, 2]

    # marked temp + one original already deleted mid-commit; _SUCCESS
    # removed to simulate marksuccessfuljobs=false
    consolidated = (
        spark.read.option("basePath", path)
        .parquet(os.path.join(path, "batch_id=0"), os.path.join(path, "batch_id=1"))
        .drop("batch_id")
    )
    consolidated.write.parquet(tmp)
    os.remove(os.path.join(tmp, "_SUCCESS"))
    from hpc_hd_textreuse_etl_spark.streaming.compaction import _COMPLETE_MARKER

    open(os.path.join(tmp, _COMPLETE_MARKER), "w").close()
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


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_auto_compaction_soak_bounds_partitions_and_survives_replay(
    spark, tmp_path
):
    """Round-8 VERDICT item: opt-in ``compact_every_n_batches`` on the
    streaming span sink must keep partition counts bounded across a long
    run (12 micro-batches, compact every 4) while the output still
    equals the batch pipeline and a crash-replay through the compacted
    base still converges."""
    from hpc_hd_textreuse_etl_spark.operators.dedup import duplicated_token_spans
    from hpc_hd_textreuse_etl_spark.streaming.sinks import (
        read_streaming_spans,
        streaming_span_dedup,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    chunks = []
    for i in range(12):
        # overlapping rolling phrases so spans keep crossing batches
        text = " ".join(words[(i + j) % len(words)] for j in range(8))
        chunks.append([(100 + i, text + f" unique{i} tail{i}")])
    src = _ingest_chunks(spark, tmp_path, chunks)

    def run():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_span_dedup(
            stream,
            state_path=str(tmp_path / "state"),
            spans_path=str(tmp_path / "spans"),
            checkpoint=str(tmp_path / "ckpt"),
            window=4,
            compact_every_n_batches=4,
        )
        q.awaitTermination()

    run()
    state, spans, ckpt = (
        str(tmp_path / "state"), str(tmp_path / "spans"), str(tmp_path / "ckpt")
    )
    assert last_committed_batch(spark, ckpt) == 11
    # bounded: without compaction each tree would hold 12 partitions
    for tree in (
        os.path.join(state, "windows"), os.path.join(state, "counts"), spans
    ):
        assert len(batch_ids(spark, tree)) <= 4 + 2, tree

    all_docs = spark.createDataFrame(
        [d for c in chunks for d in c], "doc_id long, text string"
    )
    want = {
        tuple(r)
        for r in duplicated_token_spans(all_docs, "doc_id", "text", window=4).collect()
    }
    got = {tuple(r) for r in read_streaming_spans(spark, spans).collect()}
    assert got == want

    # crash-replay the live tail through the compacted base
    _uncommit(ckpt, 11)
    run()
    assert last_committed_batch(spark, ckpt) == 11
    again = {tuple(r) for r in read_streaming_spans(spark, spans).collect()}
    assert again == want


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_auto_compaction_minhash_sink_bounded(spark, tmp_path):
    """Minhash twin of the soak: pairs stay exactly the batch pipeline's
    while both trees' partition counts stay bounded."""
    from hpc_hd_textreuse_etl_spark.operators.dedup import minhash_near_duplicates
    from hpc_hd_textreuse_etl_spark.streaming.sinks import streaming_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    chunks = [[(i, base.replace("today", f"day{i // 2}"))] for i in range(10)]
    src = _ingest_chunks(spark, tmp_path, chunks)
    sigs, pairs, ckpt = (
        str(tmp_path / "sigs"), str(tmp_path / "pairs"), str(tmp_path / "ckpt")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_minhash_dedup(
        stream, sigs_path=sigs, pairs_path=pairs, checkpoint=ckpt,
        threshold=0.5, compact_every_n_batches=3,
    )
    q.awaitTermination()
    assert len(batch_ids(spark, sigs)) <= 3 + 2
    assert len(batch_ids(spark, pairs)) <= 3 + 2
    want = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            spark.createDataFrame(
                [d for c in chunks for d in c], "doc_id long, text string"
            ),
            "doc_id", "text", threshold=0.5,
        ).collect()
    }
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.option("basePath", pairs).parquet(pairs).collect()
    }
    assert got == want


def test_compact_state_raises_on_failed_rename(spark, tmp_path, monkeypatch):
    """Hadoop FileSystem.rename reports failure by returning FALSE; a
    silently failed commit rename would present an empty state tree while
    compact_state returns success — it must raise instead."""
    import hpc_hd_textreuse_etl_spark.streaming.compaction as comp

    path = str(tmp_path / "tree")
    _write_batches(spark, path, {0: [(1, 1)], 1: [(2, 2)], 2: [(3, 3)]})
    monkeypatch.setattr(comp, "rename_path", lambda *a, **k: False)
    with pytest.raises(IOError, match="rename"):
        compact_state(spark, path, upto_batch=3)
    # the consolidated rows survived in the (marked) hidden temp — a
    # later recovery with a working FS finishes the commit
    monkeypatch.undo()
    assert recover_compaction(spark, path) is True
    rows = {
        (r.k, r.v)
        for r in spark.read.option("basePath", path).parquet(path)
        .drop("batch_id").collect()
    }
    assert rows == {(1, 1), (2, 2), (3, 3)}


def test_recovery_refuses_unmarked_temp_with_missing_originals(spark, tmp_path):
    """An UNMARKED temp next to missing originals is an inconsistency the
    protocol can't produce (deletes start only after the marker) — the
    temp may be the only surviving copy, so recovery must refuse to
    discard it rather than destroy state."""
    path = str(tmp_path / "tree")
    _write_batches(spark, path, {1: [(2, 2)], 2: [(3, 3)]})
    tmp = os.path.join(path, "_compacting_2")
    spark.createDataFrame([(1, 1), (2, 2)], "k long, v long").write.parquet(tmp)
    # only batch_id=1 survives below upto=2 (< 2 originals), no marker
    with pytest.raises(IOError, match="refusing to discard"):
        recover_compaction(spark, path)
    assert os.path.exists(tmp)
