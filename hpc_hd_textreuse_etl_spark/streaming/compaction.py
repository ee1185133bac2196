"""Maintenance compaction for ``batch_id=N``-keyed streaming state.

The streaming dedup sinks (streaming/sinks.py) write one parquet
directory per micro-batch; after 10⁴ batches the ``batch_id < N`` base
reads degrade into a small-files problem (listing cost + one tiny file
per partition). :func:`compact_state` rewrites every partition with
``batch_id < upto_batch`` into ONE consolidated partition while
preserving the sinks' replay rule.

Why the consolidated partition gets ``batch_id = upto_batch - 1``: the
sinks' replay safety is "a batch reads only ``batch_id < N`` base state,
so a replayed batch never sees its own failed attempt's writes". The
only batch Structured Streaming can replay is one at or after the last
COMMITTED batch — so as long as ``upto_batch`` ≤ the last committed
batch id, every batch that can still run or replay has
``N ≥ upto_batch > upto_batch - 1`` and sees the consolidated partition
exactly as it saw the originals. (Enforced against the checkpoint when
``checkpoint=`` is passed; otherwise the caller owns the precondition.)

What compaction deliberately forfeits: FRESH-CHECKPOINT full-history
replay. Before compaction, re-running the whole stream from a new
checkpoint converges because each epoch overwrites its own directory;
after compaction the per-batch history below ``upto_batch`` is gone, so
a from-scratch replay would duplicate those rows next to the
consolidated partition. Any state compaction makes this trade — it is
the point of compaction. Crash-replay of the live tail is what must
survive, and does (tested in tests/test_streaming_joins.py).

Crash safety of the compaction itself (run it while the stream is
STOPPED — it is maintenance, like VACUUM):

1. consolidated rows are written to ``_compacting_<upto>`` — the
   underscore prefix hides the directory from Spark/Hadoop file listing,
   so a half-written temp is invisible to any reader; a compaction-OWNED
   marker file (``_COMPACTION_COMPLETE``) is then written into the temp
   to record write completion. The marker is ours, not Spark's
   ``_SUCCESS``: a job configured with
   ``mapreduce.fileoutputcommitter.marksuccessfuljobs=false`` (or a
   committer that skips markers) would otherwise make every complete
   temp look incomplete and recovery would discard the only surviving
   copy of the compacted rows.
2. commit: delete each ``batch_id=i`` (i < upto), then rename the temp
   to ``batch_id=<upto-1>``. Every delete and the rename are CHECKED —
   Hadoop ``FileSystem`` reports failure by returning false, not by
   raising, and an unchecked false rename here would leave the visible
   tree empty while compaction "succeeds".

A crash during step 1 leaves the original partitions untouched plus an
incomplete hidden temp (no marker) — :func:`recover_compaction` deletes
it (refusing if partitions below ``upto`` are already missing, which
would mean the temp is the only surviving copy). A crash during step 2
leaves a COMPLETE hidden temp — recovery finishes the deletes and the
rename. Both sinks' read paths see either the fully-old or fully-new
layout around the one non-atomic window in step 2, which the
stopped-stream precondition makes unobservable.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import (
    _hadoop_fs,
    delete_path,
    path_exists,
    rename_path,
    touch_path,
)

_BATCH_DIR = re.compile(r"^batch_id=(\d+)$")
_TMP_DIR = re.compile(r"^_compacting_(\d+)$")
#: compaction-owned completion marker inside the hidden temp — deliberately
#: NOT Spark's ``_SUCCESS`` (absent under marksuccessfuljobs=false)
_COMPLETE_MARKER = "_COMPACTION_COMPLETE"


def _delete_checked(spark: SparkSession, path: str) -> None:
    """Delete, raising on a REPORTED failure (Hadoop returns false instead
    of raising). A path that doesn't exist is fine — the work is done."""
    if path_exists(spark, path) and not delete_path(spark, path):
        raise IOError(f"delete of {path} failed — compaction commit aborted")


def _rename_checked(spark: SparkSession, src: str, dst: str) -> None:
    if not rename_path(spark, src, dst):
        raise IOError(
            f"rename {src} -> {dst} failed — the consolidated state is still "
            f"in the hidden temp; rerun recover_compaction after fixing the FS"
        )


def _list_names(spark: SparkSession, path: str) -> list[str]:
    fs, hpath = _hadoop_fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def batch_ids(spark: SparkSession, path: str) -> list[int]:
    """Sorted batch ids present under a ``batch_id=N``-keyed tree."""
    ids = []
    for name in _list_names(spark, path):
        m = _BATCH_DIR.match(name)
        if m:
            ids.append(int(m.group(1)))
    return sorted(ids)


def last_committed_batch(spark: SparkSession, checkpoint: str) -> int | None:
    """Highest batch id with a commit record in a Structured Streaming
    checkpoint (``<checkpoint>/commits/<id>``), or None if none yet."""
    ids = [
        int(name)
        for name in _list_names(spark, os.path.join(checkpoint, "commits"))
        if name.isdigit()
    ]
    return max(ids) if ids else None


def recover_compaction(spark: SparkSession, path: str) -> bool:
    """Finish (or discard) an interrupted :func:`compact_state`.

    A complete hidden temp (``_compacting_<N>`` containing the
    compaction-owned ``_COMPACTION_COMPLETE`` marker) means the
    consolidated rows are all on disk — redo the commit: delete remaining
    ``batch_id=i`` (i < N), rename the temp in. An incomplete temp is
    discarded ONLY while the original partitions are provably still
    intact: compact_state never starts deleting originals before the
    marker lands, so an unmarked temp next to missing originals is an
    inconsistency (e.g. manual deletion, or a marker write swallowed by
    the FS) where discarding the temp could destroy the only surviving
    copy — recovery refuses with an error instead. Returns True if a
    commit was completed."""
    committed = False
    for name in _list_names(spark, path):
        m = _TMP_DIR.match(name)
        if not m:
            continue
        upto = int(m.group(1))
        tmp = os.path.join(path, name)
        if path_exists(spark, os.path.join(tmp, _COMPLETE_MARKER)):
            for i in batch_ids(spark, path):
                if i < upto:
                    _delete_checked(spark, os.path.join(path, f"batch_id={i}"))
            _rename_checked(
                spark, tmp, os.path.join(path, f"batch_id={upto - 1}")
            )
            committed = True
        else:
            # a compaction merges >= 2 partitions below upto, and deletes
            # only start after the marker is written — so an unmarked temp
            # with < 2 surviving originals below upto means originals were
            # lost some other way; the temp may be the only copy left
            below = [i for i in batch_ids(spark, path) if i < upto]
            if len(below) < 2:
                raise IOError(
                    f"refusing to discard incomplete compaction temp {tmp}: "
                    f"only {len(below)} batch_id partitions below {upto} "
                    f"survive — the temp may hold the only copy of the state"
                )
            _delete_checked(spark, tmp)
    return committed


def compact_state(
    spark: SparkSession,
    path: str,
    upto_batch: int,
    fold=None,
    checkpoint: str | None = None,
) -> int:
    """Rewrite all partitions with ``batch_id < upto_batch`` into one
    consolidated ``batch_id = upto_batch - 1`` partition.

    ``fold`` receives the consolidated DataFrame WITH its ``batch_id``
    column and must return the rows to keep WITHOUT it — the default
    just drops the column (pure concatenation). Pass an aggregation to
    also SHRINK the state: additive count partials fold to one row per
    key (:func:`compact_span_state`), latest-batch-wins outputs fold to
    the winning rows (:func:`compact_streaming_spans`).

    ``checkpoint`` (recommended): the stream's checkpoint location, used
    to enforce ``upto_batch`` ≤ last committed batch id — the replay-
    safety precondition (module docstring). Returns the number of
    partitions compacted away (0 = nothing to do)."""
    if checkpoint is not None:
        last = last_committed_batch(spark, checkpoint)
        if last is None or upto_batch > last:
            raise ValueError(
                f"upto_batch={upto_batch} exceeds the last committed batch "
                f"({last}) — compacting an uncommitted batch would let its "
                f"replay see its own writes"
            )
    recover_compaction(spark, path)
    ids = [i for i in batch_ids(spark, path) if i < upto_batch]
    if len(ids) <= 1:
        return 0
    df = (
        spark.read.option("basePath", path)
        .parquet(*[os.path.join(path, f"batch_id={i}") for i in ids])
    )
    df = fold(df) if fold is not None else df.drop("batch_id")
    if "batch_id" in df.columns:
        raise ValueError("fold must drop/exclude the batch_id column")
    tmp = os.path.join(path, f"_compacting_{upto_batch}")
    _delete_checked(spark, tmp)
    df.write.mode("overwrite").option("compression", "zstd").parquet(tmp)
    touch_path(spark, os.path.join(tmp, _COMPLETE_MARKER))
    for i in ids:
        _delete_checked(spark, os.path.join(path, f"batch_id={i}"))
    _rename_checked(spark, tmp, os.path.join(path, f"batch_id={upto_batch - 1}"))
    return len(ids)


def compact_minhash_state(
    spark: SparkSession,
    sigs_path: str,
    pairs_path: str,
    upto_batch: int,
    id_col: str = "doc_id",
    checkpoint: str | None = None,
) -> None:
    """Compact both trees maintained by ``streaming_minhash_dedup``:
    signatures concatenate (one immutable row per document — no fold),
    pairs concatenate (each pair exists exactly once, in the later
    document's batch)."""
    compact_state(spark, sigs_path, upto_batch, checkpoint=checkpoint)
    compact_state(spark, pairs_path, upto_batch, checkpoint=checkpoint)


def compact_span_state(
    spark: SparkSession,
    state_path: str,
    upto_batch: int,
    checkpoint: str | None = None,
) -> None:
    """Compact the window-position and count-partial trees maintained by
    ``streaming_span_dedup``. Positions concatenate; count partials are
    ADDITIVE, so folding them to one row per key both shrinks the state
    (O(batches·keys) → O(keys)) and leaves every downstream sum exact —
    ``duplicated_token_spans_delta`` already sums partials per key, so a
    single-partial key is just the n=1 case."""
    compact_state(
        spark, os.path.join(state_path, "windows"), upto_batch,
        checkpoint=checkpoint,
    )
    compact_state(
        spark,
        os.path.join(state_path, "counts"),
        upto_batch,
        fold=lambda df: df.groupBy("k").agg(
            F.sum("n_occurrences").cast("long").alias("n_occurrences")
        ),
        checkpoint=checkpoint,
    )


def compact_streaming_spans(
    spark: SparkSession,
    spans_path: str,
    upto_batch: int,
    id_col: str = "doc_id",
    checkpoint: str | None = None,
) -> None:
    """Compact the span OUTPUT tree. Its read contract is latest-batch-
    wins per document (``read_streaming_spans``) — a plain concat would
    put a document's superseded batch-3 spans and current batch-7 spans
    in the same partition — so the fold keeps exactly each document's
    max-batch rows, which preserves the read contract: after compaction
    the consolidated partition IS each compacted document's latest, and
    any later live partition still outranks it."""

    def keep_latest(df: DataFrame) -> DataFrame:
        latest = df.groupBy(id_col).agg(F.max("batch_id").alias("batch_id"))
        return df.join(latest, [id_col, "batch_id"]).drop("batch_id")

    compact_state(
        spark, spans_path, upto_batch, fold=keep_latest, checkpoint=checkpoint
    )


def compact_decayed_counters(
    spark: SparkSession,
    path: str,
    upto_batch: int,
    key_cols,
    value_scale_cols: tuple[str, str] = ("decayed_value_scaled", "decayed_value_n"),
    checkpoint: str | None = None,
) -> None:
    """Compact the scaled-integer partial tree maintained by
    ``streaming_decayed_counters``: partials are additive bigints, so
    they fold to one exact row per key."""
    scaled, n = value_scale_cols

    def fold(df: DataFrame) -> DataFrame:
        return df.groupBy(*list(key_cols)).agg(
            F.sum(scaled).cast("bigint").alias(scaled),
            F.sum(n).cast("bigint").alias(n),
        )

    compact_state(spark, path, upto_batch, fold=fold, checkpoint=checkpoint)
