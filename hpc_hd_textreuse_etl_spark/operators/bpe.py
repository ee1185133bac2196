"""Distributed BPE tokenizer training — the merge-learning loop of
byte-pair encoding run as Spark aggregations, deterministic end to end.

Real tokenizer training (GPT-2 BPE, SentencePiece in BPE mode) is the
canonical "needs the whole corpus, doesn't fit one machine" step of an
LLM data pipeline. The algorithm is inherently iterative — each merge
changes the symbol stream the next pair count sees — so the scalable
formulation is rounds of corpus-wide aggregation, exactly like the CC /
k-core / Lloyd loops elsewhere in this repo:

round r:
  1. pair counts: every document emits its adjacent symbol pairs
     (in-row zip of the symbol array against its own tail — zero
     shuffle to build pairs), then ONE map-side-combined count shuffle
     keyed on the pair;
  2. best pair: global argmax with total-order tie-break
     (count DESC, w1 ASC, w2 ASC) — plans TakeOrderedAndProject
     (per-task 1-row heaps) and re-enters the plan as a broadcast
     1-row join, never a driver-side value;
  3. merge: every document rewrites its symbol stream greedily
     left-to-right, fusing adjacent (w1, w2) into w1||sep||w2. The
     rewrite is a Catalyst ``aggregate`` fold over the symbol array
     with a string accumulator — greedy BPE semantics fall out of the
     fold order (after fusing, the accumulator's tail is the MERGED
     symbol, so an overlapping occurrence can't double-fire: "a a a"
     under merge (a,a) → "a@@a a", the reference behavior);
  4. localCheckpoint the (id, stream) table — the per-round lineage
     cut every iterative operator here uses.

Determinism: counts are exact integers, the argmax tie-break is a
total order, and the greedy fold is a pure function of the symbol
array — so the learned merge table AND the final segmentation are
value-hash-reproducible across engines (the DuckDB oracle replays the
same rounds with ``list_reduce``), partitionings, and retries.

Scale: each round is one bounded shuffle (pairs → counts) over symbol
pairs — the same cost as one TF round — plus a map-only rewrite.
Production trainers run hundreds of merges on a corpus SAMPLE
(hash_sample upstream); the loop cost is rounds × one aggregation,
with no state beyond the (tiny) merge table.

``sep`` must be a string that cannot occur inside an input symbol
(symbols are whitespace-split tokens, so any space-free marker works;
the default "@@" assumes input tokens don't contain "@@" — callers
with adversarial text should pre-escape).

Known bound: the greedy rewrite folds into an immutable string
accumulator, so ONE document's rewrite is O(L²) in its symbol count
(each fold step copies the accumulator). That is irrelevant at the
typical ≤ a-few-thousand-symbol document lengths tokenizer training
samples use, but a 10M-symbol megadocument would stall its task —
chunk such inputs first (operators/chunking.py); pair statistics are
insensitive to chunk boundaries beyond one lost pair per cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
    tracked_local_checkpoint,
)
from hpc_hd_textreuse_etl_spark.functions.text import tokens


def _pair_counts(corpus: DataFrame) -> DataFrame:
    """Adjacent-pair counts of the space-joined symbol stream ``__t``."""
    toks = F.split(F.col("__t"), " ")
    n = F.size(toks)
    pairs = F.transform(
        F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda t, i: F.struct(
            t.alias("w1"), F.element_at(toks, i + F.lit(2)).alias("w2")
        ),
    )
    return (
        corpus.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_count"))
    )


def _merge_stream(sep: str):
    """Column expression rewriting ``__t`` by greedily fusing adjacent
    (__bw1, __bw2) — a fold with a string accumulator (see module doc)."""
    toks = F.split(F.col("__t"), " ")
    n = F.size(toks)
    w1, w2 = F.col("__bw1"), F.col("__bw2")
    folded = F.aggregate(
        F.slice(toks, F.lit(2), F.greatest(n - 1, F.lit(0))),
        F.element_at(toks, 1),
        lambda acc, x: F.when(
            ((acc == w1) | F.endswith(acc, F.concat(F.lit(" "), w1))) & (x == w2),
            F.concat(acc, F.lit(sep), x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )
    return F.when(n < F.lit(2), F.col("__t")).otherwise(folded)


def bpe_train(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int,
    sep: str = "@@",
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus.

    Returns ``(merges, corpus)``: the merge table
    ``(merge_rank, w1, w2, pair_count)`` in learned order, and the
    final segmentation ``(id, text)`` with merged symbols joined by
    ``sep``. Both are deterministic (see module doc). Empty documents
    are dropped (they carry no pairs and no symbols)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    corpus = docs.select(
        F.col(id_col).alias("__id"),
        F.concat_ws(" ", tokens(text_col)).alias("__t"),
    ).where(F.length("__t") > 0)
    merge_tables = []
    for r in range(n_merges):
        best = (
            _pair_counts(corpus)
            .orderBy(F.desc("pair_count"), F.asc("w1"), F.asc("w2"))
            .limit(1)
            .select(
                F.col("w1").alias("__bw1"),
                F.col("w2").alias("__bw2"),
                "pair_count",
            )
        )
        merge_tables.append(
            best.select(
                F.lit(r).cast("int").alias("merge_rank"),
                F.col("__bw1").alias("w1"),
                F.col("__bw2").alias("w2"),
                "pair_count",
            )
        )
        # LEFT join on a constant, not crossJoin: when the corpus has no
        # pairs left, ``best`` is EMPTY and a cross join would silently
        # wipe the corpus — the left join keeps every document with a
        # NULL pair, and the merge fold's NULL conditions fall through
        # to the no-op append branch (stream unchanged; training is a
        # fixpoint past the last real merge).
        corpus = (
            corpus.join(F.broadcast(best), F.lit(True), "left")
            .withColumn("__t", _merge_stream(sep))
            .select("__id", "__t")
        )
        if checkpoint:
            # tracked (functions/checkpoints.py): round blocks pin until
            # the caller's release point — eager release here is unsafe
            # because each lazy checkpoint reads its predecessor's blocks
            corpus = tracked_local_checkpoint(corpus, eager=False)
    merges = merge_tables[0]
    for t in merge_tables[1:]:
        merges = merges.unionAll(t)
    return merges, corpus.select(
        F.col("__id").alias(id_col), F.col("__t").alias(text_col)
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "@@",
    checkpoint_every: int = 50,
) -> DataFrame:
    """Apply a LEARNED merge table to (possibly new) text — inference
    side of the trainer: replay merges in rank order, same greedy fold.
    The merge table is collected to the driver (it is vocabulary-sized
    by construction — hundreds to tens of thousands of rows) and
    inlined as literals, keeping the rewrite a map-only plan.

    Each merge is one chained projection; real merge tables run to tens
    of thousands of rows, and tens of thousands of stacked projections
    blow up Catalyst analysis time and driver memory. So the replay
    cuts lineage with a lazy ``localCheckpoint`` every
    ``checkpoint_every`` merges — the same bound the trainer applies
    per round — keeping the analyzed plan depth O(checkpoint_every)
    regardless of vocabulary size."""
    ranked = [
        (r["w1"], r["w2"])
        for r in merges.orderBy("merge_rank").collect()
    ]
    corpus = docs.select(
        F.col(id_col).alias("__id"),
        F.concat_ws(" ", tokens(text_col)).alias("__t"),
    ).where(F.length("__t") > 0)
    for i, (w1, w2) in enumerate(ranked, start=1):
        corpus = corpus.withColumn("__bw1", F.lit(w1)).withColumn(
            "__bw2", F.lit(w2)
        ).withColumn("__t", _merge_stream(sep)).select("__id", "__t")
        if checkpoint_every and i % checkpoint_every == 0 and i < len(ranked):
            corpus = tracked_local_checkpoint(corpus, eager=False)
    return corpus.select(
        F.col("__id").alias(id_col), F.col("__t").alias(text_col)
    )
