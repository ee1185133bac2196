"""Fuzzy (edit-distance) joins for entity resolution.

The dedup family (operators/dedup.py) catches near-identical *documents*
via set similarity; entity resolution over short strings — titles,
author names, place names, the reference corpus's edition metadata —
wants bounded **edit distance** instead, where token-set methods are
blind to single-character variants.

All-pairs Levenshtein is O(n²·L²) and a non-starter; the candidate set
must come from *sound* blocking (no pair within the threshold may be
missed). The universal sound block for edit distance is length:
``lev(a, b) >= |len(a) - len(b)|``, so a pair within ``max_dist`` has
lengths within ``max_dist``. That length *band* becomes an equi-join —
no range join, no cartesian — by bucketing ``len // (max_dist + 1)``
and exploding the right side into its three adjacent buckets (a bucket
is wider than the band, so the left row's own bucket plus neighbors
covers every admissible length; each admissible pair meets in exactly
one bucket, the left row's). Extra ``block_cols`` (same brand, same
language, …) tighten candidates further with plain equality.

Everything is Catalyst built-ins: explode + equi-join + ``levenshtein``
filter, one shuffle on (bucket, blocks). Per-bucket skew is bounded by
the length histogram; at corpus scale pass a discriminating
``block_cols`` — length alone over 100 TB of same-length strings is a
quadratic block, the same contract as embedding_near_duplicates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_text: str,
    right_text: str,
    max_dist: int = 2,
    block_cols: Sequence[tuple[str, str]] = (),
    dist_col: str = "edit_distance",
) -> DataFrame:
    """All (left, right) pairs with ``levenshtein(text) <= max_dist``.

    Exact under the sound length-band block: no admissible pair is
    missed, and each is emitted once. Output columns:
    ``(left_id, right_id, <dist_col>)``.
    """
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    w = max_dist + 1
    lb = left.select(
        F.col(left_id).alias("__lid"),
        F.col(left_text).alias("__lt"),
        (F.length(left_text).cast("bigint") / w).cast("bigint").alias("__bucket"),
        *[F.col(lc).alias(f"__blk{i}") for i, (lc, _) in enumerate(block_cols)],
    )
    rb = right.select(
        F.col(right_id).alias("__rid"),
        F.col(right_text).alias("__rt"),
        F.explode(
            F.array(
                *[
                    (F.length(right_text).cast("bigint") / w).cast("bigint") + d
                    for d in (-1, 0, 1)
                ]
            )
        ).alias("__bucket"),
        *[F.col(rc).alias(f"__blk{i}") for i, (_, rc) in enumerate(block_cols)],
    )
    keys = ["__bucket"] + [f"__blk{i}" for i in range(len(block_cols))]
    pairs = lb.join(rb, keys)
    return (
        pairs.where(
            F.abs(F.length("__lt") - F.length("__rt")) <= max_dist
        )
        .withColumn(dist_col, F.levenshtein("__lt", "__rt"))
        .where(F.col(dist_col) <= max_dist)
        .select(
            F.col("__lid").alias(left_id if left_id != right_id else f"{left_id}_l"),
            F.col("__rid").alias(right_id if left_id != right_id else f"{right_id}_r"),
            dist_col,
        )
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    block_cols: Sequence[str] = (),
    dist_col: str = "edit_distance",
) -> DataFrame:
    """Unordered within-table pairs (``id_a < id_b``) within
    ``max_dist`` edits — the candidate-pair generator shape shared with
    the dedup family, so the pairs feed straight into
    ``resolve_duplicates`` / ``leakage_safe_split``."""
    out = fuzzy_join(
        df, df, id_col, id_col, text_col, text_col,
        max_dist=max_dist, block_cols=[(c, c) for c in block_cols],
        dist_col=dist_col,
    )
    la, lb = f"{id_col}_l", f"{id_col}_r"
    return out.where(F.col(la) < F.col(lb)).select(
        F.col(la).alias("id_a"), F.col(lb).alias("id_b"), dist_col
    )
