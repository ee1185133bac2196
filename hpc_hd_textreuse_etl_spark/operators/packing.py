"""Sequence packing: group documents into packs of at most
``budget`` tokens — the step that turns a curated corpus into
fixed-length training sequences without padding waste.

Global first-fit packing is inherently sequential, so the scale design
shards first (deterministic hash of the id), packs WITHIN shards in
parallel, and emits ``(shard, pack)`` composite pack ids. Shard count
tunes parallelism vs packing efficiency (waste is O(budget) per shard
boundary — negligible for thousands of shards over billions of docs).

Two strategies:

- ``"cumsum"`` — pure Catalyst: one window cumsum per shard; item i
  goes to pack ``floor(cumsum_exclusive / budget)``. Fully
  SQL-expressible (oracle-gated), but a pack can overshoot the budget
  by up to one document (the straddling item) — callers that truncate
  sequences to ``budget`` anyway (the common training setup) lose at
  most that tail.
- ``"nextfit"`` — exact ``≤ budget`` guarantee via an Arrow-batched
  per-shard scan (``applyInPandas``, O(1) state): a document that
  would overflow the current pack opens a new one. This is the strict
  variant; pytest pins its invariants (never exceeds budget, covers
  every document, deterministic under repartitioning).

Documents longer than the budget get a pack of their own in both
strategies (truncation is the caller's policy, not silently applied).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str,
    size_col: str,
    budget: int,
    num_shards: int = 64,
    strategy: str = "cumsum",
    shard_col: str | None = None,
) -> DataFrame:
    """``(id, size, shard, pack_id)`` — pack assignment per document.

    Ordering within a shard is (size desc, id): placing large documents
    first reduces fragmentation, and the id tiebreak makes the
    assignment a pure function of (ids, sizes, budget, num_shards) —
    reruns, retries and engines agree.

    ``shard_col`` overrides the default xxhash64 id shard with a
    caller-computed column (a portable hash for oracle runs, or a
    domain/source key to keep related documents packable together)."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    shard = (
        F.col(shard_col)
        if shard_col is not None
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
    )
    base = df.select(
        F.col(id_col),
        F.col(size_col).cast("long").alias("size"),
        shard.cast("long").alias("shard"),
    )
    if strategy == "cumsum":
        w = (
            Window.partitionBy("shard")
            .orderBy(F.desc("size"), F.asc(id_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cum_excl = F.coalesce(F.sum("size").over(w), F.lit(0))
        return base.select(
            id_col,
            "size",
            "shard",
            F.floor(cum_excl / budget).cast("long").alias("pack_id"),
        )
    if strategy == "nextfit":
        import pandas as pd

        def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
            pdf = pdf.sort_values(
                ["size", id_col], ascending=[False, True]
            ).reset_index(drop=True)
            pack_ids, current, used = [], 0, 0
            for size in pdf["size"]:
                if used > 0 and used + size > budget:
                    current += 1
                    used = 0
                used += size
                pack_ids.append(current)
            pdf["pack_id"] = pack_ids
            return pdf[[id_col, "size", "shard", "pack_id"]]

        schema = f"{id_col} long, size long, shard long, pack_id long"
        return base.groupBy("shard").applyInPandas(pack, schema=schema)
    raise ValueError(f"unknown strategy {strategy!r}")


def pack_utilization(packs: DataFrame, budget: int) -> DataFrame:
    """Per-pack fill report: ``(shard, pack_id, n_docs, tokens,
    utilization)`` — the packing-efficiency QC a training pipeline
    tracks."""
    return (
        packs.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("size").alias("tokens"),
        )
        .withColumn("utilization", F.col("tokens").cast("double") / budget)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    shard_by: str,
    compression: str = "zstd",
) -> DataFrame:
    """Write the corpus as exactly ``num_shards`` balanced parquet files
    — the fixed-fan-in layout training loaders expect (one reader per
    shard, no small-file explosion, stable shard membership).

    Sharding is ``pmod(xxhash64(shard_by), num_shards)`` — the same
    deterministic hash family as everything else, so a document's shard
    survives reruns and incremental rebuilds. The repartition clusters
    each shard into one task and the hive-style ``partitionBy`` writes
    one ``shard_id=N`` directory per shard — exactly one file each,
    regardless of how shard values hash across tasks (a bare
    ``repartition(n, col)`` does NOT map n values to n partitions
    bijectively). Returns the read-back DataFrame (write-then-read-back,
    the engine's materialization contract); loaders that want shard N
    read ``{path}/shard_id=N/`` via partition pruning."""
    spark = df.sparkSession
    out = df.withColumn(
        "shard_id", F.pmod(F.xxhash64(F.col(shard_by)), F.lit(num_shards))
    ).repartition(num_shards, "shard_id")
    (
        out.write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("shard_id")
        .parquet(path)
    )
    return spark.read.parquet(path)
