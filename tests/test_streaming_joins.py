"""Streaming joins + idempotent sink: value-equivalence against the
batch twin, and replay convergence for the foreachBatch sink."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.streaming.events import read_event_stream, run_to_memory
from hpc_hd_textreuse_etl_spark.streaming.joins import enrich_stream, interval_join
from hpc_hd_textreuse_etl_spark.streaming.sinks import (
    read_idempotent_table,
    write_stream_idempotent,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"
BASE = datetime.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def join_events(spark, tmp_path_factory):
    """clicks at t=0 per user; purchases inside/outside the 1h bound."""
    path = str(tmp_path_factory.mktemp("sjoin") / "events")
    rows = [
        (1, BASE, 1, "click", 1.0),
        (2, BASE + datetime.timedelta(minutes=30), 1, "purchase", 9.0),
        (3, BASE + datetime.timedelta(hours=3), 1, "purchase", 7.0),  # outside bound
        (4, BASE, 2, "click", 1.0),
        (5, BASE + datetime.timedelta(minutes=59), 2, "purchase", 5.0),
        (6, BASE + datetime.timedelta(minutes=10), 3, "purchase", 3.0),  # no click
    ]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(path)
    return path


def test_enrich_stream_matches_batch_join(spark, join_events):
    dim = spark.createDataFrame(
        [(1, "alice"), (2, "bob")], "user_id long, name string"
    )
    stream = read_event_stream(spark, join_events)
    run_to_memory(enrich_stream(stream, dim, "user_id"), "enriched")
    got = {
        (r.event_id, r.name)
        for r in spark.sql("select event_id, name from enriched").collect()
    }
    batch = spark.read.parquet(join_events).join(F.broadcast(dim), "user_id", "left")
    want = {(r.event_id, r.name) for r in batch.select("event_id", "name").collect()}
    assert got == want and len(got) == 6


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_interval_join_matches_batch_and_bounds(spark, join_events):
    stream = read_event_stream(spark, join_events)
    clicks = stream.filter(F.col("event_type") == "click")
    purchases = stream.filter(F.col("event_type") == "purchase")
    joined = interval_join(clicks, purchases, "user_id", max_delay="1 hour")
    run_to_memory(joined, "attributed")
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.sql("select l_event_id, r_event_id from attributed").collect()
    }
    # user 1: purchase at +30min attributed, +3h outside the bound;
    # user 2: +59min attributed; user 3: purchase with no click → dropped
    assert got == {(1, 2), (4, 5)}


def test_idempotent_sink_replay_converges(spark, join_events, tmp_path):
    out = str(tmp_path / "sink")
    ckpt_a = str(tmp_path / "ckpt_a")
    ckpt_b = str(tmp_path / "ckpt_b")
    q = write_stream_idempotent(read_event_stream(spark, join_events), out, ckpt_a)
    q.awaitTermination()
    first = sorted(r.event_id for r in read_idempotent_table(spark, out).collect())
    assert first == [1, 2, 3, 4, 5, 6]
    # full replay from a fresh checkpoint re-processes the same input as
    # the same epoch ids → overwrites the same directories → no dupes
    q = write_stream_idempotent(read_event_stream(spark, join_events), out, ckpt_b)
    q.awaitTermination()
    again = sorted(r.event_id for r in read_idempotent_table(spark, out).collect())
    assert again == first


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_streaming_minhash_dedup_matches_batch_and_replays(spark, tmp_path):
    """Each micro-batch dedups against the signature table accumulated
    from prior batches; the union of per-batch pair partitions must
    equal the BATCH pipeline's pairs over everything ingested (every
    pair lands exactly once, in the later document's batch), and a full
    replay from a fresh checkpoint must converge to the same state."""
    from hpc_hd_textreuse_etl_spark.operators.dedup import minhash_near_duplicates
    from hpc_hd_textreuse_etl_spark.streaming.sinks import streaming_minhash_dedup

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    chunks = [
        [(1, base), (2, base)],                                  # batch of dups
        [(3, base.replace("quick", "swift")), (5, "completely different content about spark shuffle partitions")],
        [(4, base.replace("today", "tomorrow morning")), (6, "another unrelated text entirely about catalyst rules")],
    ]
    src = str(tmp_path / "docs")
    for chunk in chunks:
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run(ckpt_name):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_minhash_dedup(
            stream,
            sigs_path=str(tmp_path / "sigs"),
            pairs_path=str(tmp_path / "pairs"),
            checkpoint=str(tmp_path / ckpt_name),
            threshold=0.5,
        )
        q.awaitTermination()
        return {
            (r.id_a, r.id_b)
            for r in spark.read.option("basePath", str(tmp_path / "pairs"))
            .parquet(str(tmp_path / "pairs"))
            .collect()
        }

    got = run("ckpt_a")
    all_docs = spark.createDataFrame(
        [d for c in chunks for d in c], "doc_id long, text string"
    )
    want = {
        (r.id_a, r.id_b)
        for r in minhash_near_duplicates(
            all_docs, "doc_id", "text", threshold=0.5
        ).collect()
    }
    assert got == want
    assert (1, 2) in got  # sanity: non-trivial pair set
    # full replay from a fresh checkpoint: same epoch ids → same
    # batch_id dirs overwritten, prior-batch filter sees the same base
    assert run("ckpt_b") == want


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_streaming_span_dedup_matches_batch_and_replays(spark, tmp_path):
    """read_streaming_spans after three micro-batches must equal the
    batch ExactSubstr pipeline over everything ingested — including a
    base doc whose span EXTENDS in a later batch (latest-partition-wins
    read) — and a fresh-checkpoint replay must converge."""
    from hpc_hd_textreuse_etl_spark.operators.dedup import duplicated_token_spans
    from hpc_hd_textreuse_etl_spark.streaming.sinks import (
        read_streaming_spans,
        streaming_span_dedup,
    )

    chunks = [
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta other two")],
        # extends doc 1's span [0,6) to [0,8) via crossing start=4
        [(10, "epsilon zeta eta theta trailing words here now"),
         (12, "clean doc with no repeats at all whatsoever today")],
        [(11, "rep one two three rep one two three end pad")],
    ]
    src = str(tmp_path / "docs")
    for chunk in chunks:
        spark.createDataFrame(chunk, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run(ckpt_name):
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
        return {
            tuple(r)
            for r in read_streaming_spans(spark, str(tmp_path / "spans")).collect()
        }

    got = run("ckpt_a")
    all_docs = spark.createDataFrame(
        [d for c in chunks for d in c], "doc_id long, text string"
    )
    want = {
        tuple(r)
        for r in duplicated_token_spans(all_docs, "doc_id", "text", window=4).collect()
    }
    assert got == want
    assert (1, 0, 8, 8, 4) in got  # doc 1's span extended across batches
    assert run("ckpt_b") == want   # fresh-checkpoint replay converges


def test_streaming_signature_dedup_matches_batch_and_replays(spark, tmp_path):
    """The image-ingest sink: each micro-batch of images is perceptually
    hashed once and its signatures banded against the accumulated table;
    the union of per-batch pair partitions must equal the batch
    signature pipeline over all images (each pair exactly once, in the
    later image's batch), and a fresh-checkpoint replay must converge."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        signature_near_duplicates,
    )
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        perceptual_image_hashes,
    )
    from hpc_hd_textreuse_etl_spark.streaming.sinks import (
        streaming_signature_dedup,
    )

    def flat(v):
        return png_encode(8, 8, 1, bytes([v] * 64))

    def gradient(reverse=False):
        px = [(r * 8 + c) * 4 % 256 for r in range(8) for c in range(8)]
        if reverse:
            px = px[::-1]
        return png_encode(8, 8, 1, bytes(px))

    chunks = [
        [(1, flat(5)), (2, flat(7))],          # identical dhash (all-zero)
        [(3, flat(9)), (5, gradient())],
        [(4, flat(11)), (6, gradient(True))],
    ]
    src = str(tmp_path / "media")
    for chunk in chunks:
        spark.createDataFrame(chunk, "media_id long, data binary").coalesce(
            1
        ).write.mode("append").parquet(src)

    def run(ckpt_name):
        stream = (
            spark.readStream.schema("media_id long, data binary")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = streaming_signature_dedup(
            stream,
            sigs_path=str(tmp_path / "sigs"),
            pairs_path=str(tmp_path / "pairs"),
            checkpoint=str(tmp_path / ckpt_name),
            max_hamming=2,
        )
        q.awaitTermination()
        return {
            (r.id_a, r.id_b, r.hamming)
            for r in spark.read.option("basePath", str(tmp_path / "pairs"))
            .parquet(str(tmp_path / "pairs"))
            .collect()
        }

    got = run("ckpt_a")
    all_media = spark.createDataFrame(
        [m for c in chunks for m in c], "media_id long, data binary"
    )
    hashes = perceptual_image_hashes(all_media, "media_id", "data").select(
        "media_id", F.col("phash").alias("sig")
    )
    want = {
        (r.id_a, r.id_b, r.hamming)
        for r in signature_near_duplicates(
            hashes, "media_id", "sig", max_hamming=2
        ).collect()
    }
    assert got == want
    # all four flat images are mutual dups at Hamming 0
    assert {(a, b) for a, b, _ in got} >= {(1, 2), (1, 3), (2, 3), (1, 4)}
    # replay from a fresh checkpoint converges to the same pair set
    assert run("ckpt_b") == want


def test_streaming_signature_dedup_star_collapse(spark, tmp_path):
    """Star-collapsed image ingest: re-ingested duplicates attach by one
    hamming-0 row to the EARLIEST prior holder of their signature, and
    the union of per-batch star outputs resolves to the same connected
    components as the batch all-pairs pipeline."""
    from hpc_hd_textreuse_etl_spark.functions.png_codec import png_encode
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        signature_near_duplicates,
    )
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        perceptual_image_hashes,
    )
    from hpc_hd_textreuse_etl_spark.streaming.sinks import (
        streaming_signature_dedup,
    )
    from tests.test_dedup import _components

    def flat(v):
        return png_encode(8, 8, 1, bytes([v] * 64))

    def gradient(reverse=False):
        px = [(r * 8 + c) * 4 % 256 for r in range(8) for c in range(8)]
        if reverse:
            px = px[::-1]
        return png_encode(8, 8, 1, bytes(px))

    chunks = [
        [(1, flat(5)), (2, flat(7))],
        [(3, flat(9)), (5, gradient())],
        [(4, flat(11)), (6, gradient(True))],
    ]
    src = str(tmp_path / "media")
    for chunk in chunks:
        spark.createDataFrame(chunk, "media_id long, data binary").coalesce(
            1
        ).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("media_id long, data binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_signature_dedup(
        stream,
        sigs_path=str(tmp_path / "sigs"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint=str(tmp_path / "ckpt"),
        max_hamming=2,
        collapse_identical=True,
    )
    q.awaitTermination()
    star = [
        (r.id_a, r.id_b, r.hamming)
        for r in spark.read.option("basePath", str(tmp_path / "pairs"))
        .parquet(str(tmp_path / "pairs"))
        .collect()
    ]
    all_media = spark.createDataFrame(
        [m for c in chunks for m in c], "media_id long, data binary"
    )
    hashes = perceptual_image_hashes(all_media, "media_id", "data").select(
        "media_id", F.col("phash").alias("sig")
    )
    pairs = signature_near_duplicates(
        hashes, "media_id", "sig", max_hamming=2
    ).collect()
    assert _components([(a, b) for a, b, _ in star]) == _components(
        [(r.id_a, r.id_b) for r in pairs]
    )
    # linear: the 4-member flat clique emits exactly 3 star rows, each
    # anchored at the earliest holder (id 1), never the 6-pair clique
    zero = [(a, b) for a, b, h in star if h == 0]
    flat_zero = [e for e in zero if e[1] in (2, 3, 4)]
    assert sorted(flat_zero) == [(1, 2), (1, 3), (1, 4)]
