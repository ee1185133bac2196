"""Piece defragmentation: merge near-duplicate character-offset spans.

The reference implements this as a Scala window UDAF executed in an
out-of-process notebook (``etl_textreuse/assets/piece_id_mappings.ipynb``
cells 2-6, orchestrated by ``assets/defragmentation.py:14-35``). The
aggregate is order-dependent with a buffer-pruning sequential pass and a
``merge`` that deliberately throws — i.e. it is NOT a parallel aggregate
and cannot be expressed with built-in window functions. The idiomatic
PySpark form is an ``applyInPandas`` ordered scan per document: documents
are independent, so the operator parallelizes across ``trs_id`` while the
scan inside a group stays sequential (exactly the semantics the window
frame ``PARTITION BY trs_id ORDER BY trs_start, piece_id ROWS UNBOUNDED
PRECEDING`` gave the reference).

Semantics replicated exactly (``piece_id_mappings.ipynb`` cell 2):

- scan pieces of one document ordered by ``(trs_start, piece_id)``;
- keep a buffer of previously seen pieces whose start is within
  ``BUFFER_WINDOW`` (180) chars before the current start (prefix-prune,
  clearing when all are older);
- the current piece maps to the FIRST buffered piece ``r`` (itself
  included, appended last) with both ``|r.start - start|`` and
  ``|r.end - end|`` ≤ ``min(max(min(len, r_len) // 4, 10), 180)``
  (integer division, lengths are ``end - start``).

Scale notes: one shuffle on ``trs_id``; per-group state is O(buffer) ≪
group size. Arrow batches move each group to Python once — this is the
engine's only Python hot path besides multimodal decode, matching the
reference's single-UDAF budget (SURVEY §2.12).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.ids import dense_ids

BUFFER_WINDOW = 180
MIN_LIMIT = 10
MAX_LIMIT = 180


def defrag_scan_group(starts, ends, piece_ids) -> list:
    """Sequential defrag scan over one document's pieces, already sorted
    by (start, piece_id). Returns the target piece id for each input.

    Pure-Python core, shared by the Spark operator and the brute-force
    property tests.
    """
    buf: list[tuple[int, int, int]] = []  # (start, end, piece_id)
    out = []
    drop = 0
    for s, e, pid in zip(starts, ends, piece_ids):
        # prune pieces starting more than BUFFER_WINDOW before s
        lo = s - BUFFER_WINDOW
        while drop < len(buf) and buf[drop][0] < lo:
            drop += 1
        if drop:
            buf = buf[drop:]
            drop = 0
        buf.append((s, e, pid))
        cur_len = e - s
        for rs, re, rpid in buf:
            limit = min(max(min(cur_len, re - rs) // 4, MIN_LIMIT), MAX_LIMIT)
            if abs(rs - s) <= limit and abs(re - e) <= limit:
                out.append(rpid)
                break
    return out


def piece_id_mappings(
    pieces: DataFrame,
    doc_col: str = "trs_id",
    start_col: str = "trs_start",
    end_col: str = "trs_end",
    piece_col: str = "piece_id",
) -> DataFrame:
    """``orig_piece_id -> defrag_piece_id`` mapping with dense renumbered
    targets (reference: ipynb cells 4-6)."""

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([start_col, piece_col], kind="mergesort")
        mapping = defrag_scan_group(
            pdf[start_col].tolist(), pdf[end_col].tolist(), pdf[piece_col].tolist()
        )
        return pd.DataFrame(
            {"orig_piece_id": pdf[piece_col].values, "defrag_mapping": mapping}
        )

    raw = pieces.select(doc_col, start_col, end_col, piece_col).groupBy(doc_col).applyInPandas(
        scan, schema="orig_piece_id long, defrag_mapping long"
    )
    # renumber distinct mapping targets densely, sorted (ipynb cell 5)
    targets = dense_ids(
        raw.select("defrag_mapping").distinct(),
        order_by=["defrag_mapping"],
        id_col="defrag_piece_id",
        use_window=False,  # piece cardinality can exceed window-path comfort
    )
    return raw.join(targets, "defrag_mapping").select(
        "orig_piece_id", "defrag_piece_id"
    )


def defrag_pieces(orig_pieces: DataFrame, mappings: DataFrame) -> DataFrame:
    """Merged piece extents (reference: assets/defragmentation.py:42-57)."""
    return (
        mappings.join(
            orig_pieces, mappings.orig_piece_id == orig_pieces.piece_id
        )
        .groupBy("defrag_piece_id", "trs_id")
        .agg(
            F.min("trs_start").alias("trs_start"),
            F.max("trs_end").alias("trs_end"),
        )
        .withColumnRenamed("defrag_piece_id", "piece_id")
    )


def defrag_textreuses(orig_textreuses: DataFrame, mappings: DataFrame) -> DataFrame:
    """Merged reuse edges with multiplicity (reference:
    assets/defragmentation.py:59-86)."""
    m1 = mappings.withColumnRenamed("orig_piece_id", "piece1_id").withColumnRenamed(
        "defrag_piece_id", "defrag1"
    )
    m2 = mappings.withColumnRenamed("orig_piece_id", "piece2_id").withColumnRenamed(
        "defrag_piece_id", "defrag2"
    )
    return (
        orig_textreuses.join(m1, "piece1_id", "left")
        .join(m2, "piece2_id", "left")
        .groupBy(F.col("defrag1").alias("piece1_id"), F.col("defrag2").alias("piece2_id"))
        .agg(F.count(F.lit(1)).alias("num_orig_links"))
    )
