"""DSIR-style data selection via importance resampling.

Data Selection with Importance Resampling (Xie et al., NeurIPS 2023)
scores every raw-corpus document by how target-like it is under two
cheap hashed bag-of-n-grams language models, then resamples the corpus
with probability proportional to the importance weight
``w(x) = p_target(x) / p_raw(x)``. This module is the Spark-first
realization; the reference engine has no counterpart (beyond-parity,
like operators/sampling.py and operators/corpus_stats.py).

Pipeline shape (everything Catalyst, zero Python UDFs):

1. :func:`hashed_ngram_counts` — word unigrams + bigrams hashed into
   ``num_buckets`` feature buckets; one explode + one ``(id, bucket)``
   aggregation. The gram strings die inside the stage — only 8-byte
   bucket ids shuffle.
2. :func:`dsir_log_weights` — add-alpha smoothed bucket models for the
   target and raw corpora (each at most ``num_buckets`` rows, so the
   log-ratio model BROADCASTS no matter how big the corpora are), then
   one broadcast join + one per-document aggregation:
   ``log w(d) = Σ_b c_b(d) · (log p_t(b) − log p_r(b))``.
3. ``gumbel_topk_sample`` (operators/sampling.py) — resample top-k in
   the LOG domain: ``exp(log w)`` of a long document under- or
   overflows doubles, the Gumbel-trick priority ``log w + g`` never
   does.

At 100 TB: the corpus-wide gram explode runs exactly once (the
per-document count table is pinned via a tracked localCheckpoint), and
the data-proportional shuffles carry only (id, bucket, count) triples —
the count aggregation, the per-doc weight sum, and a final id-only
coverage join (every document gets a weight; an empty feature bag is
weight 1, i.e. ``log_weight = 0``). The models are bounded by
``num_buckets`` (a config, not the data) and move as one broadcast; the
resample is a ``TakeOrderedAndProject`` (per-task k-row heaps, no
global sort).

Determinism: with ``hash_family="portable"`` the bucket assignment is
the md5-based cross-engine hash (functions/hashing.py) and the per-doc
sum folds in bucket order, so weights are reproducible to libm-``ln``
ulp across engines — the same residual class as BM25/matmul-ANN, so the
DuckDB gates rank (plans/queries.py ``dsir_importance_ranking``) and
epsilon-test values (tests/test_dsir.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64
from hpc_hd_textreuse_etl_spark.functions.text import tokens


def _grams(text_col: str) -> F.Column:
    """Word unigrams + bigrams as one array<string> (JVM higher-order
    ops; bigrams joined with a single space, matching the DuckDB oracle
    expression token for token)."""
    w = tokens(F.col(text_col))
    # zip the token array with its shifted self instead of a positional
    # transform whose lambda re-evaluates the tokenization expression
    # per element (interpreted higher-order lambdas re-run closed-over
    # expressions each call — O(tokens × doc_len) per row; profiled as
    # the classifier-stage hot path). concat_ws drops the null padding
    # beyond the shorter side; the slice trims the degenerate last
    # element, reproducing the positional result token for token.
    bigrams = F.when(
        F.size(w) >= 2,
        F.slice(
            F.zip_with(
                w,
                F.slice(w, 2, F.size(w)),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
            1,
            F.size(w) - 1,
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(w, bigrams)


def hashed_ngram_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 4096,
    hash_family: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Per-document hashed n-gram feature counts: ``(id, bucket, cnt)``.

    ``xxhash64`` (default) is the production family; ``"portable"`` is
    the md5-based cross-engine hash for oracle-gated runs. Buckets are
    non-negative ``[0, num_buckets)`` under both (``pmod`` for the
    signed xxhash64; the portable hash is already non-negative)."""
    from hpc_hd_textreuse_etl_spark.functions.skew import spread_small_input

    gram = F.explode(_grams(text_col)).alias("gram")
    if hash_family == "portable":
        bucket = portable_hash64(F.col("gram")) % num_buckets
    else:
        bucket = F.pmod(F.xxhash64(F.col("gram"), F.lit(seed)), F.lit(num_buckets))
    # spread_small_input: the tokenize + gram hash + map-side count is
    # the feature build's whole cost and runs under the first exchange —
    # an under-partitioned input serializes it on one core (guide §2.5);
    # no-op on split inputs
    return (
        spread_small_input(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), gram)
        .select(id_col, bucket.cast("int").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    hash_family: str = "xxhash64",
    seed: int = 7,
    use_checkpoints: bool = True,
) -> DataFrame:
    """Per-document DSIR log importance weight over the raw corpus:
    ``(id, log_weight)`` with
    ``log_weight = Σ_b c_b · (log p_target(b) − log p_raw(b))``, both
    models add-``alpha`` smoothed over ``num_buckets`` hashed buckets.

    The raw model is the corpus itself, so every bucket a corpus
    document touches exists in the model — no unseen-bucket default
    path for SCORING. The model's log-ratio rows are restricted to raw
    buckets for the same reason, but the target total ``n_t`` is summed
    over the WHOLE target count table: when the target is a separate
    dataset (the normal DSIR deployment — target = curated reference,
    raw = crawl), target grams hashing into buckets no raw document
    touches still belong in p_target's denominator, and dropping them
    would shift every document's weight by its gram count × a constant,
    re-ordering documents of different lengths.

    The per-document sum folds over the document's buckets in bucket
    order (sorted struct fold), fixing the floating-point summation
    order across partitionings, retries, and engines. Every corpus
    document gets a weight: documents with no tokens have an empty
    feature bag, whose importance weight is exactly ``Π(nothing) = 1``
    — ``log_weight = 0.0`` — rather than being dropped.

    The per-document count table feeds both the raw model and the
    scoring join; it is pinned once via a tracked ``localCheckpoint``
    (functions/checkpoints.py — released at the registry hygiene
    point), so the corpus-wide gram explode runs exactly once per
    call, keeping the module docstring's two-shuffle claim true.
    ``use_checkpoints=False`` is the lazy escape hatch (no eager pin,
    no job at plan-construction time; the explode re-runs per
    consumer) for looping callers without a
    ``release_local_checkpoints()`` hygiene point — same contract as
    ``ivf_index`` / ``semantic_dedup``."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        tracked_local_checkpoint,
    )

    doc_counts = hashed_ngram_counts(
        corpus, id_col, text_col, num_buckets, hash_family, seed
    )
    if use_checkpoints:
        doc_counts = tracked_local_checkpoint(doc_counts)
    raw = doc_counts.groupBy("bucket").agg(F.sum("cnt").alias("cnt_r"))
    tgt = (
        hashed_ngram_counts(target, id_col, text_col, num_buckets, hash_family, seed)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt_t"))
    )
    totals = raw.agg(F.sum("cnt_r").alias("n_r")).crossJoin(
        tgt.agg(F.sum("cnt_t").alias("n_t"))
    )
    model = raw.join(tgt, "bucket", "left")
    b = float(num_buckets)
    log_ratio = F.log(
        (F.coalesce(F.col("cnt_t"), F.lit(0)).cast("double") + F.lit(alpha))
        / (F.col("n_t").cast("double") + F.lit(alpha * b))
    ) - F.log(
        (F.col("cnt_r").cast("double") + F.lit(alpha))
        / (F.col("n_r").cast("double") + F.lit(alpha * b))
    )
    model = (
        model.crossJoin(F.broadcast(totals))  # totals: exactly one row
        .select("bucket", log_ratio.alias("log_ratio"))
    )
    terms = doc_counts.join(F.broadcast(model), "bucket").select(
        id_col,
        "bucket",
        (F.col("cnt").cast("double") * F.col("log_ratio")).alias("term"),
    )
    weights = terms.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("term"),
        ).alias("log_weight")
    )
    return corpus.select(id_col).join(weights, id_col, "left").select(
        id_col, F.coalesce(F.col("log_weight"), F.lit(0.0)).alias("log_weight")
    )
