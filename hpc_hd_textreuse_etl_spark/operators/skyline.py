"""Pareto frontier (skyline) — the multi-objective filter of OLAP
("best price/size tradeoffs") and of data curation (keep documents not
dominated on quality × freshness × length).

A row q is dominated when some row p is at-least-as-good on EVERY
objective and strictly better on at least one ("good" per-dimension
direction: ``min`` or ``max``). The skyline is the set of undominated
rows — a deterministic function of the input multiset (duplicates of a
skyline point don't dominate each other, so all copies survive;
total-order determinism needs no tiebreaker).

Scale shape (the classic two-phase distributed skyline):

1. **Local prune** — each Arrow batch drops rows dominated *within the
   batch* (``mapInPandas``, vectorized numpy: repeatedly take the
   lexicographically-smallest remaining point by objective sum — which
   no later point can dominate — and mask out everything it dominates;
   O(s·n) per batch for skyline size s). Sound: dominance anywhere ⟹
   the dominator also prunes locally or survives to phase 2. This is
   the only Python stage, and it touches each row once inside the scan
   stage — zero shuffle.
2. **Global verify** — surviving candidates (skylines are small: O(logᵈn)
   expected for independent dimensions) are self-anti-joined under the
   dominance predicate with the candidate set broadcast — a
   BroadcastNestedLoopJoin over m candidates, O(m²) compute but no
   shuffle and no driver collect.

The 2-D special case :func:`pareto_frontier_2d` is pure Catalyst: sort
by (d1, d2), a point survives iff its d2 strictly improves on the
running best of every strictly-smaller d1 group — one window over one
exchange, no Python, no quadratic verify.

For the 100 TB argument: phase 1's output is bounded by
partitions × local-skyline-size. If a pathological input
(anti-correlated dimensions) makes the candidate set too big to
broadcast, :func:`pareto_frontier` contracts it before the verify:
re-run the local prune on the candidates at a reduced partition count
(round-robin repartition mixes survivors from different original
partitions, so the set shrinks monotonically), repeating until it fits
the broadcast budget — and if contraction bottoms out at ONE partition,
the partition-local prune has seen every candidate, the result is the
exact skyline, and the quadratic verify is skipped entirely.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _validate(dims: Sequence[str], directions: Sequence[str]) -> list[bool]:
    if len(dims) != len(directions) or not dims:
        raise ValueError("dims and directions must be same non-zero length")
    flips = []
    for d in directions:
        if d not in ("min", "max"):
            raise ValueError(f"direction must be 'min' or 'max', got {d!r}")
        flips.append(d == "max")
    return flips


def _prune_block(pdf: "pd.DataFrame", dim_list: list[str], flips: list[bool]):
    """Exact in-memory skyline of one pandas block (numpy, vectorized):
    repeatedly take the smallest-objective-sum remaining point — which
    no later point can dominate — and mask out everything it dominates.
    Duplicates of a skyline point all survive."""
    import numpy as np

    # canonical orientation: every objective is "minimize"
    mat = pdf[dim_list].to_numpy(dtype="float64", copy=True)
    for j, flip in enumerate(flips):
        if flip:
            mat[:, j] = -mat[:, j]
    alive = np.ones(len(pdf), dtype=bool)
    keep = np.zeros(len(pdf), dtype=bool)
    score = mat.sum(axis=1)
    while alive.any():
        idx = np.flatnonzero(alive)
        pick = idx[np.argmin(score[idx])]
        keep[pick] = True
        alive[pick] = False
        rest = np.flatnonzero(alive)
        if rest.size == 0:
            break
        le = (mat[rest] >= mat[pick]).all(axis=1)
        lt = (mat[rest] > mat[pick]).any(axis=1)
        dominated = le & lt
        alive[rest[dominated]] = False
        # exact duplicates of the pick are skyline members too
        dup = le & ~lt
        keep[rest[dup]] = True
        alive[rest[dup]] = False
    return pdf[keep]


def pareto_frontier(
    df: DataFrame,
    dims: Sequence[str],
    directions: Sequence[str],
    *,
    max_broadcast_candidates: int = 500_000,
    max_contractions: int = 6,
) -> DataFrame:
    """General-d skyline: partition-local numpy prune, then a broadcast
    anti-join verify among the surviving candidates.

    Pathological inputs (anti-correlated dimensions → huge candidate
    sets) no longer risk a broadcast/driver blowup: when phase 1 leaves
    more than ``max_broadcast_candidates`` rows, the candidate set is
    round-robin repartitioned to fewer partitions and locally pruned
    again (monotonically contracting — survivors from different
    partitions now meet), up to ``max_contractions`` times. If the set
    contracts all the way to one partition, that partition's prune saw
    every candidate, so the result is already the exact skyline and the
    O(m²) verify is skipped. If the budget runs out with the set still
    over ``max_broadcast_candidates``, the operator raises instead of
    broadcasting an oversized set."""
    import pandas as pd  # noqa: F401 (signature requirement)

    flips = _validate(dims, directions)
    dim_list = list(dims)
    schema = df.schema

    def local_prune(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        # streaming partition-local skyline: the accumulator stays
        # skyline-sized, so memory is bounded by the partition's own
        # skyline, not the partition
        acc = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            acc = pdf if acc is None else pd.concat([acc, pdf], ignore_index=True)
            acc = _prune_block(acc, dim_list, flips).reset_index(drop=True)
        if acc is not None and len(acc):
            yield acc

    # materialize once: the count guard, and both sides of the verify
    # join, reuse the checkpointed candidates instead of re-running the
    # phase-1 scan (MEMORY_AND_DISK, so oversized sets spill not OOM).
    # Checkpoints are TRACKED (functions/checkpoints.py): superseded
    # contraction rounds release immediately; the surviving pin is freed
    # by the caller's release_local_checkpoints() hygiene point.
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        release_checkpoint,
        tracked_local_checkpoint,
    )

    candidates = tracked_local_checkpoint(
        df.mapInPandas(local_prune, schema=schema)
    )

    n = candidates.count()
    for _ in range(max_contractions):
        if n <= max_broadcast_candidates:
            break
        n_parts = candidates.rdd.getNumPartitions()
        if n_parts <= 1:
            # one partition ⟹ the local prune was global ⟹ exact
            return candidates
        target = max(1, n_parts // 8)
        contracted = tracked_local_checkpoint(
            candidates.repartition(target).mapInPandas(local_prune, schema=schema)
        )
        release_checkpoint(candidates)  # superseded round's blocks are dead
        candidates = contracted
        n = candidates.count()
        if candidates.rdd.getNumPartitions() <= 1:
            return candidates

    if n > max_broadcast_candidates:
        # contraction budget exhausted with the set still too big to
        # broadcast — refusing beats silently re-creating the blowup the
        # contraction loop exists to prevent. (A non-equi anti-join has
        # no shuffle-based physical strategy in Spark, so there is no
        # bounded-memory verify to fall back to.)
        raise ValueError(
            f"pareto_frontier: {n:,} candidates remain after "
            f"{max_contractions} contractions (> max_broadcast_candidates="
            f"{max_broadcast_candidates:,}); raise max_contractions or "
            "max_broadcast_candidates, or pre-aggregate the input"
        )

    left = candidates.alias("q")
    right = F.broadcast(
        candidates.select(*[F.col(c).alias(f"p_{c}") for c in dim_list]).alias("p")
    )
    le_terms = []
    lt_terms = []
    for c, flip in zip(dim_list, flips):
        pc, qc = F.col(f"p_{c}"), F.col(f"q.{c}")
        le_terms.append(pc >= qc if flip else pc <= qc)
        lt_terms.append(pc > qc if flip else pc < qc)
    dominates = le_terms[0]
    for t in le_terms[1:]:
        dominates = dominates & t
    any_strict = lt_terms[0]
    for t in lt_terms[1:]:
        any_strict = any_strict | t
    return left.join(right, dominates & any_strict, "left_anti")


def pareto_frontier_2d(
    df: DataFrame, d1: str, d2: str, directions: tuple[str, str] = ("min", "min")
) -> DataFrame:
    """Pure-Catalyst 2-D skyline. After orienting both objectives to
    'minimize', a point is dominated iff some point with d1 strictly
    smaller has d2 <= ours, or d1 equal and d2 strictly smaller — i.e.
    survive iff d2 equals its d1-group's min AND that min strictly
    improves the prefix min over all strictly-smaller d1 groups.

    Scale shape: ONE map-side-combined aggregate to per-group minima
    (|distinct d1| rows ≪ n), the prefix-min window runs on that small
    table only (never on the data), and survivors broadcast back into
    an equi-join — no global sort of the input, no single-partition
    window over it."""
    from pyspark.sql import Window

    flips = _validate((d1, d2), directions)
    s1 = (-F.col(d1)) if flips[0] else F.col(d1)
    s2 = (-F.col(d2)) if flips[1] else F.col(d2)
    work = df.withColumn("__s1", s1).withColumn("__s2", s2)
    grp_min = work.groupBy("__s1").agg(F.min("__s2").alias("__gmin"))
    # unpartitioned window over the per-group MINIMA table only
    # (|distinct __s1| rows, never the input) — benign single-
    # partition trip (SCALE.md "Unpartitioned windows")
    prev = Window.orderBy("__s1").rowsBetween(Window.unboundedPreceding, -1)
    frontier_keys = (
        grp_min.withColumn("__pmin", F.min("__gmin").over(prev))
        .where(F.col("__pmin").isNull() | (F.col("__gmin") < F.col("__pmin")))
        .select(F.col("__s1").alias("__f1"), F.col("__gmin").alias("__fmin"))
    )
    out = work.join(
        F.broadcast(frontier_keys),
        (F.col("__s1") == F.col("__f1")) & (F.col("__s2") == F.col("__fmin")),
        "left_semi",
    )
    return out.drop("__s1", "__s2")
