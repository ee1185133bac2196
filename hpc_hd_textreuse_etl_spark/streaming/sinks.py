"""Streaming sinks beyond the built-ins: idempotent parquet append via
``foreachBatch``.

The batch engine materialises snapshots with ``_SUCCESS``-gated
overwrite (catalog.materialise); streams need the incremental twin.
Plain ``writeStream.format("parquet")`` already gives exactly-once for
append — this module covers the case the built-in can't: a sink keyed
by micro-batch that stays correct when a failed batch is REPLAYED.
Replay is not an edge case: after any crash between sink write and
checkpoint commit, the next start re-runs the last batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_stream_idempotent(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Start an idempotent parquet sink: each micro-batch overwrites its
    own ``batch_id=N`` subdirectory.

    Idempotence comes from the (batch_id → directory) mapping: a
    replayed batch has the same epoch id, overwrites the same directory,
    and the table converges to the same content — the standard
    foreachBatch recipe for sinks without transactions. Readers use
    :func:`read_idempotent_table` (basePath so the partition column is
    projected out).
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_idempotent_table(spark, path: str) -> DataFrame:
    """Read everything the idempotent sink has committed, dropping the
    physical ``batch_id`` partition column."""
    df = spark.read.option("basePath", path).parquet(path)
    return df.drop("batch_id")


def write_stream_upsert(
    stream_df: DataFrame,
    snapshot_path: str,
    checkpoint: str,
    key_cols,
    order_cols,
    delete_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Streaming CDC sink: fold each micro-batch of keyed change rows
    into the current-state parquet snapshot (operators/cdc.py
    ``merge_upsert``), the ``foreachBatch`` twin of the batch path.

    Idempotent under batch REPLAY by a stronger mechanism than the
    batch_id-directory sink: the merge itself is convergent — the
    explicit ``order_cols`` total order decides every key, so applying
    the same delta twice (or deltas out of order) lands on the same
    snapshot. Combined with merge_upsert's temp-dir + atomic-rename
    swap, a crash at any point leaves either the old or the new
    snapshot, never a torn one.
    """
    from hpc_hd_textreuse_etl_spark.operators.cdc import merge_upsert

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df.sparkSession,
            snapshot_path,
            batch_df,
            key_cols,
            order_cols,
            delete_col=delete_col,
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_decayed_counters(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    key_cols,
    value_col: str,
    ts_col: str,
    as_of: str,
    half_life: str = "365 days",
    max_half_lives: int = 20,
    value_scale: int = 2,
    out_col: str = "decayed_value",
    trigger_available_now: bool = True,
):
    """Streaming twin of ``operators/temporal.decayed_sum``: each
    micro-batch collapses to per-key SCALED-INTEGER partials
    (units·2^(K−d) — exact, associative), written to its own
    ``batch_id=N`` directory. The additive merge CANNOT go through the
    upsert sink — replaying an additive delta into a running total
    double-counts — so idempotence comes from the batch-keyed
    directory instead (a replayed batch overwrites itself), and the
    read side (:func:`read_decayed_counters`) sums the partials. The
    snapshot-at-``as_of`` semantics match the batch operator exactly,
    so the maintained table is bit-equal to a from-scratch
    ``decayed_sum`` over everything ingested."""
    from hpc_hd_textreuse_etl_spark.operators.temporal import decayed_sum

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        part = decayed_sum(
            batch_df, key_cols, value_col, ts_col, as_of,
            half_life, max_half_lives, value_scale, out_col,
        ).select(*key_cols, f"{out_col}_scaled", f"{out_col}_n")
        part.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(path, f"batch_id={batch_id}")
        )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_decayed_counters(
    spark,
    path: str,
    key_cols,
    max_half_lives: int = 20,
    value_scale: int = 2,
    out_col: str = "decayed_value",
) -> DataFrame:
    """Current decayed totals: sum the per-batch integer partials and
    derive the double exactly like the batch operator (one bigint→
    double conversion + one IEEE division)."""
    from pyspark.sql import functions as F

    df = spark.read.option("basePath", path).parquet(path).drop("batch_id")
    denom = float(10**value_scale * (1 << max_half_lives))
    out = df.groupBy(*list(key_cols)).agg(
        F.sum(f"{out_col}_scaled").cast("bigint").alias(f"{out_col}_scaled"),
        F.sum(f"{out_col}_n").cast("bigint").alias(f"{out_col}_n"),
    )
    return out.withColumn(
        out_col, F.col(f"{out_col}_scaled").cast("double") / F.lit(denom)
    )


def streaming_minhash_dedup(
    docs_stream: DataFrame,
    sigs_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_size: int = 5,
    num_bands: int = 8,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
    trigger_available_now: bool = True,
    compact_every_n_batches: int | None = None,
):
    """Streaming near-duplicate detection at ingest: each micro-batch is
    the DELTA of ``operators/dedup.minhash_near_duplicates_delta`` —
    signatures are computed for the batch's documents only and banded
    against the signature table accumulated from all PRIOR batches, so
    per-batch cost is shingling the batch plus one bucket join, and the
    corpus text is never re-scanned.

    Two outputs, both ``batch_id=N``-keyed parquet (the idempotent-sink
    recipe above): ``sigs_path`` accumulates the signature table,
    ``pairs_path`` the near-dup pairs each batch introduced. Replay
    safety needs one extra rule beyond the directory overwrite: the
    base side reads ``batch_id < N`` ONLY (partition-pruned), so a
    replayed batch never sees its own failed attempt's signatures and
    converges to the same pairs. The union of all pair partitions
    equals the batch pipeline's pairs restricted to cross/within-batch
    pairs in arrival order — every pair appears exactly once, in the
    partition of the LATER document's batch.

    ``compact_every_n_batches=N`` (opt-in) keeps the state trees'
    partition counts bounded WITHOUT a separate maintenance window:
    after every Nth batch's writes, the sink folds all partitions below
    the last COMMITTED batch (``upto_batch = batch_id - 1``, which the
    compaction's committed-frontier guard accepts by construction) into
    one. Runs after this batch's base reads and writes complete, so the
    in-flight batch never observes a half-compacted tree; a replay of
    this batch reads a strictly-lower batch_id range — content-identical
    through the consolidated partition (tested). At most ``N + 2`` live
    partitions per tree at any time instead of one per batch forever.
    """
    from pyspark.sql import functions as F

    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        _verify_candidates,
        lsh_candidate_pairs_delta,
        minhash_signatures,
    )

    rows_per_band = num_hashes // num_bands

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from hpc_hd_textreuse_etl_spark.catalog import path_exists

        delta_sigs = minhash_signatures(
            batch_df.select(id_col, text_col), id_col, text_col,
            num_hashes, shingle_size, hash_family,
        ).persist()
        if path_exists(spark, sigs_path):
            base = (
                spark.read.option("basePath", sigs_path).parquet(sigs_path)
                .filter(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
        else:
            base = delta_sigs.limit(0)
        cands = lsh_candidate_pairs_delta(
            base, delta_sigs, id_col, num_bands, rows_per_band, hash_family
        )
        pairs = _verify_candidates(
            cands, base.unionByName(delta_sigs), id_col, num_hashes, threshold
        )
        pairs.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(pairs_path, f"batch_id={batch_id}")
        )
        delta_sigs.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(sigs_path, f"batch_id={batch_id}")
        )
        delta_sigs.unpersist()
        if (
            compact_every_n_batches
            and batch_id > 0
            and batch_id % compact_every_n_batches == 0
        ):
            from hpc_hd_textreuse_etl_spark.streaming.compaction import (
                compact_minhash_state,
            )

            compact_minhash_state(
                spark, sigs_path, pairs_path,
                upto_batch=batch_id - 1, checkpoint=checkpoint,
            )

    writer = docs_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_signature_dedup(
    media_stream: DataFrame,
    sigs_path: str,
    pairs_path: str,
    checkpoint: str,
    id_col: str = "media_id",
    data_col: str = "data",
    method: str = "dhash",
    max_hamming: int = 3,
    band_bits: int | None = None,
    bits: int = 64,
    trigger_available_now: bool = True,
    compact_every_n_batches: int | None = None,
    collapse_identical: bool = False,
):
    """Streaming PERCEPTUAL IMAGE dedup at ingest — the image sibling of
    :func:`streaming_minhash_dedup`, completing the batch → delta →
    streaming ladder for the signature family: each micro-batch of
    ``(id, image bytes)`` is hashed once
    (operators/multimodal.perceptual_image_hashes — the image bytes
    never touch a shuffle), and the batch's 8-byte signatures run the
    delta leg (operators/dedup.signature_near_duplicates_delta) against
    the signature table accumulated from all PRIOR batches.

    Same two ``batch_id=N``-keyed outputs and the same replay rule as
    the minhash sink: the base side reads ``batch_id < N`` only
    (partition-pruned), so a replayed batch never sees its own failed
    attempt and converges to identical pairs; the union of pair
    partitions equals the batch pipeline's pairs in arrival order,
    each pair exactly once in the LATER image's batch.
    ``compact_every_n_batches`` bounds both trees' partition counts via
    the same committed-frontier concatenate compaction (signatures and
    pairs are both immutable rows — no fold needed).

    ``collapse_identical=True`` applies the delta star collapse per
    micro-batch (see signature_near_duplicates_delta): a re-ingested
    duplicate emits ONE star row to the earliest prior holder of its
    signature (the global prior minimum — every later batch anchors to
    the same id, so the per-batch outputs stay connectivity-equivalent
    to the batch pipeline's components), and only signatures new to
    the accumulated table band."""
    from pyspark.sql import functions as F

    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        signature_near_duplicates_delta,
    )
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        perceptual_image_hashes,
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from hpc_hd_textreuse_etl_spark.catalog import path_exists

        # perceptual_image_hashes persists its own output (round 12);
        # the rename is a zero-cost projection over that pin, so a
        # second persist here would just double-register the blocks —
        # keep ONE pin and release it at the end of the batch.
        hashes = perceptual_image_hashes(
            batch_df.select(id_col, data_col), id_col, data_col, method
        )
        delta_sigs = hashes.withColumnRenamed("phash", "sig")
        if path_exists(spark, sigs_path):
            base = (
                spark.read.option("basePath", sigs_path).parquet(sigs_path)
                .filter(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
        else:
            base = delta_sigs.limit(0)
        pairs = signature_near_duplicates_delta(
            base, delta_sigs, id_col, "sig", max_hamming, band_bits, bits,
            collapse_identical,
        )
        pairs.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(pairs_path, f"batch_id={batch_id}")
        )
        delta_sigs.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(sigs_path, f"batch_id={batch_id}")
        )
        hashes.unpersist()
        if (
            compact_every_n_batches
            and batch_id > 0
            and batch_id % compact_every_n_batches == 0
        ):
            from hpc_hd_textreuse_etl_spark.streaming.compaction import (
                compact_minhash_state,
            )

            # both trees are immutable rows — the minhash concatenate
            # compaction applies verbatim
            compact_minhash_state(
                spark, sigs_path, pairs_path,
                upto_batch=batch_id - 1, checkpoint=checkpoint,
            )

    writer = media_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_span_dedup(
    docs_stream: DataFrame,
    state_path: str,
    spans_path: str,
    checkpoint: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    min_occurrences: int = 2,
    trigger_available_now: bool = True,
    compact_every_n_batches: int | None = None,
):
    """Streaming ExactSubstr span dedup at ingest: each micro-batch runs
    ``operators/dedup.duplicated_token_spans_delta`` against the window
    state accumulated from prior batches, emitting the span sets that
    batch CHANGED (its own docs' spans, plus refreshed spans of earlier
    docs it pushed over the occurrence threshold — extension included).

    State is two batch_id-keyed parquet trees under ``state_path``:
    ``windows/`` (positions) and ``counts/`` (per-batch count PARTIALS
    — counts are additive, so partials summed on read are exact; the
    delta operator folds them for touched/affected keys only, never
    corpus-wide). ``spans_path`` gets one ``batch_id=N`` partition per
    batch; because marks only ever accumulate, a doc's CURRENT spans
    are its latest-batch rows — :func:`read_streaming_spans`. Replay
    safety follows the recipe above: every base read filters
    ``batch_id < N``, every write overwrites its own partition.

    ``compact_every_n_batches=N`` (opt-in): same bounded-partition
    policy as ``streaming_minhash_dedup`` — after every Nth batch's
    writes, fold the window/count state trees (counts are additive
    partials → one row per key) and the span output tree
    (latest-batch-wins fold) below the committed frontier. Long-soak
    tested: partition counts stay bounded while replay convergence and
    read-back equality hold.
    """
    from pyspark.sql import functions as F

    from hpc_hd_textreuse_etl_spark.catalog import path_exists
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        duplicated_token_spans_delta,
        span_dedup_state,
    )

    wpath = os.path.join(state_path, "windows")
    cpath = os.path.join(state_path, "counts")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df = batch_df.select(id_col, text_col).persist()
        delta_w, delta_c = span_dedup_state(batch_df, id_col, text_col, window)
        if path_exists(spark, wpath):
            base_w = (
                spark.read.option("basePath", wpath).parquet(wpath)
                .filter(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
            base_c = (
                spark.read.option("basePath", cpath).parquet(cpath)
                .filter(F.col("batch_id") < batch_id)
                .drop("batch_id")
            )
        else:
            base_w, base_c = delta_w.limit(0), delta_c.limit(0)
        spans = duplicated_token_spans_delta(
            base_w, base_c, batch_df, id_col, text_col, window, min_occurrences
        )
        spans.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(spans_path, f"batch_id={batch_id}")
        )
        delta_w.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(wpath, f"batch_id={batch_id}")
        )
        delta_c.write.mode("overwrite").option("compression", "zstd").parquet(
            os.path.join(cpath, f"batch_id={batch_id}")
        )
        batch_df.unpersist()
        if (
            compact_every_n_batches
            and batch_id > 0
            and batch_id % compact_every_n_batches == 0
        ):
            from hpc_hd_textreuse_etl_spark.streaming.compaction import (
                compact_span_state,
                compact_streaming_spans,
            )

            compact_span_state(
                spark, state_path, upto_batch=batch_id - 1, checkpoint=checkpoint
            )
            compact_streaming_spans(
                spark, spans_path, id_col=id_col,
                upto_batch=batch_id - 1, checkpoint=checkpoint,
            )

    writer = docs_stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_streaming_spans(spark, spans_path: str, id_col: str = "doc_id") -> DataFrame:
    """Current span table maintained by :func:`streaming_span_dedup`:
    marks only accumulate, so a document's latest batch_id partition
    holds its complete current span set — keep exactly those rows."""
    from pyspark.sql import functions as F

    df = spark.read.option("basePath", spans_path).parquet(spans_path)
    latest = df.groupBy(id_col).agg(F.max("batch_id").alias("batch_id"))
    return df.join(latest, [id_col, "batch_id"]).drop("batch_id")
