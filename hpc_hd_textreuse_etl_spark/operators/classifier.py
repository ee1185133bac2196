"""Discriminative quality-classifier training + corpus scoring.

The standard CCNet/GPT-3-style pre-training quality filter (Wenzek et
al. 2020 §4.4; Brown et al. 2020 App. A): train a cheap linear
classifier on "curated reference vs raw crawl" labels, score every
corpus document, keep the high-scoring slice. This module implements
the closed-form member of that family — **hashed-feature multinomial
Naive Bayes** — because its training is two integer aggregations (no
iterative optimizer), which makes the whole trainer exactly
reproducible in the DuckDB oracle and trivially mergeable across
partitions. The log-odds it produces are a linear model over the same
hashed bag-of-n-grams features DSIR uses (operators/dsir.py), so NB
here is literally "fastText with closed-form weights" for this feature
space. DSIR covers the importance-WEIGHTING half of data selection;
this is the discriminative half the reference engine also lacks
(beyond-parity).

Pipeline shape (everything Catalyst, zero Python UDFs):

1. Features: :func:`hashed_ngram_counts` (dsir.py) — word unigrams +
   bigrams hashed into ``num_buckets`` buckets; gram strings die inside
   the stage, only 8-byte bucket ids shuffle.
2. :func:`nb_quality_model` — per-class bucket counts → add-``alpha``
   smoothed multinomial weights
   ``log_ratio(b) = ln p(b|pos) − ln p(b|neg)``. The model is exactly
   ``num_buckets`` rows (a config, not the data) → always broadcastable.
3. :func:`nb_quality_scores` — one broadcast join + one per-document
   sorted fold:
   ``log_odds(d) = ln(n_pos/n_neg) + Σ_b c_b(d) · log_ratio(b)``.
   Every corpus document gets a score; an empty feature bag scores the
   prior alone.

At 100 TB: training shuffles ``(bucket, class) → count`` pairs (at most
``2·num_buckets`` aggregated rows), scoring shuffles ``(id, bucket,
cnt)`` triples once — the same two-shuffle budget as DSIR. The scored
column feeds the existing evaluation operators
(operators/evaluation.py ``threshold_sweep`` / ``roc_auc``) and the
opt-in ``classifier_keep`` curation stage (plans/curation.py).

Determinism: with ``hash_family="portable"`` buckets use the md5-based
cross-engine hash and the per-document sum folds in bucket order, so
scores reproduce across partitionings/retries exactly and across
engines to libm-``ln`` ulp — the DSIR/BM25 residual class, so the
DuckDB gates pin the integer count table bit-exactly and the score
RANKING (plans/queries.py ``quality_classifier_weights`` /
``quality_classifier_ranking``), while score VALUES are epsilon-tested
against a pure-Python recomputation in tests/test_classifier.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.dsir import hashed_ngram_counts


def nb_quality_model(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    hash_family: str = "xxhash64",
    seed: int = 7,
) -> DataFrame:
    """Train the NB quality model: one row per bucket in
    ``[0, num_buckets)`` with
    ``(bucket, cnt_pos, cnt_neg, log_ratio)`` where the counts are the
    class-wise hashed-gram totals (integers — bit-exact across engines)
    and ``log_ratio = ln((cnt_pos + α)/(n_pos + α·B)) −
    ln((cnt_neg + α)/(n_neg + α·B))`` is the smoothed multinomial
    weight. ``label_col`` must be boolean-like (true = curated/positive
    class). Buckets no training gram touched still get a row — their
    smoothed weight ``ln((α·(n_neg + α·B))/((n_pos + α·B)·α))`` is NOT
    zero, and dropping them would shift every scored document by its
    unseen-gram count × that constant.

    Scale shape: two count aggregations keyed on ``(bucket)`` after a
    class split; the densifying join is against ``spark.range(B)`` —
    the model size is the ``num_buckets`` CONFIG, never the corpus."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    lab = F.col(label_col).cast("boolean")
    counts = hashed_ngram_counts(
        labeled.withColumn("__lab", lab),
        "__lab", text_col, num_buckets, hash_family, seed,
    )
    per_class = counts.groupBy("bucket").agg(
        F.sum(F.when(F.col("__lab"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint").alias("cnt_pos"),
        F.sum(F.when(~F.col("__lab"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint").alias("cnt_neg"),
    )
    spark = labeled.sparkSession
    dense = (
        spark.range(num_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(per_class, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_pos", F.lit(0)).cast("bigint").alias("cnt_pos"),
            F.coalesce("cnt_neg", F.lit(0)).cast("bigint").alias("cnt_neg"),
        )
    )
    totals = dense.agg(
        F.sum("cnt_pos").alias("n_pos"), F.sum("cnt_neg").alias("n_neg")
    )
    b = float(num_buckets)
    log_ratio = F.log(
        (F.col("cnt_pos").cast("double") + F.lit(alpha))
        / (F.col("n_pos").cast("double") + F.lit(alpha * b))
    ) - F.log(
        (F.col("cnt_neg").cast("double") + F.lit(alpha))
        / (F.col("n_neg").cast("double") + F.lit(alpha * b))
    )
    return dense.crossJoin(F.broadcast(totals)).select(  # totals: one row
        "bucket", "cnt_pos", "cnt_neg", log_ratio.alias("log_ratio")
    )


def nb_quality_scores(
    corpus: DataFrame,
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    num_buckets: int = 4096,
    alpha: float = 1.0,
    hash_family: str = "xxhash64",
    seed: int = 7,
    model: DataFrame | None = None,
    use_checkpoints: bool = True,
) -> DataFrame:
    """Score every corpus document under the NB quality model:
    ``(id, log_odds)`` with
    ``log_odds = ln(n_pos_docs / n_neg_docs) + Σ_b c_b · log_ratio(b)``
    — positive means "more curated-like than crawl-like". The prior
    uses DOCUMENT counts (the class balance a deployment thresholds
    against), the likelihood uses gram counts; both classes must be
    non-empty (raises otherwise — a one-class "classifier" is a
    constant and silently scoring with one is a footgun).

    Pass ``model=nb_quality_model(...)`` to reuse a trained model
    across several corpora; otherwise it is trained here from
    ``labeled``. The per-document sum folds in bucket order (sorted
    struct fold — partition-independent, engine-reproducible). The
    corpus feature table is pinned via a tracked ``localCheckpoint``
    when it has multiple consumers downstream; ``use_checkpoints=False``
    keeps the plan fully lazy (ivf_index/dsir contract)."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        tracked_local_checkpoint,
    )

    if model is None:
        model = nb_quality_model(
            labeled, id_col, text_col, label_col,
            num_buckets, alpha, hash_family, seed,
        )
    lab = F.col(label_col).cast("boolean")
    doc_totals = labeled.agg(
        F.sum(lab.cast("bigint")).alias("n_pos_docs"),
        F.sum((~lab).cast("bigint")).alias("n_neg_docs"),
    )
    prior = doc_totals.select(
        F.when(
            (F.col("n_pos_docs") > 0) & (F.col("n_neg_docs") > 0),
            F.log(F.col("n_pos_docs").cast("double"))
            - F.log(F.col("n_neg_docs").cast("double")),
        ).alias("log_prior")
    )
    doc_counts = hashed_ngram_counts(
        corpus, id_col, text_col, num_buckets, hash_family, seed
    )
    if use_checkpoints:
        doc_counts = tracked_local_checkpoint(doc_counts)
    terms = doc_counts.join(F.broadcast(model), "bucket").select(
        id_col,
        "bucket",
        (F.col("cnt").cast("double") * F.col("log_ratio")).alias("term"),
    )
    sums = terms.groupBy(id_col).agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("bucket", "term"))),
            F.lit(0.0),
            lambda acc, s: acc + s.getField("term"),
        ).alias("ll")
    )
    out = (
        corpus.select(id_col)
        .join(sums, id_col, "left")
        .crossJoin(F.broadcast(prior))  # prior: exactly one row
        .select(
            id_col,
            (F.coalesce(F.col("ll"), F.lit(0.0)) + F.col("log_prior")).alias(
                "log_odds"
            ),
        )
    )
    # a NULL prior means a one-class training set — fail loudly at
    # materialization (assert_true evaluates per row, zero cost when ok)
    return out.select(
        id_col,
        F.when(
            F.assert_true(
                F.col("log_odds").isNotNull(),
                F.lit(
                    "nb_quality_scores: training labels are one-class "
                    "(n_pos_docs or n_neg_docs is 0)"
                ),
            ).isNull(),
            F.col("log_odds"),
        ).alias("log_odds"),
    )


def _doc_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_buckets: int,
    hash_family: str,
    seed: int,
) -> DataFrame:
    """Length-normalized hashed-gram features ``(id, bucket, x)`` with
    ``x = cnt / Σ cnt`` per document — bounded to (0, 1], so a fixed
    learning rate is stable regardless of document length. The division
    is one exact per-row double op (cross-engine-safe)."""
    counts = hashed_ngram_counts(
        df.select(id_col, text_col), id_col, text_col,
        num_buckets, hash_family, seed,
    )
    totals = counts.groupBy(id_col).agg(
        F.sum("cnt").cast("double").alias("__total")
    )
    return counts.join(totals, id_col).select(
        id_col, "bucket",
        (F.col("cnt").cast("double") / F.col("__total")).alias("x"),
    )


def _sorted_fold_sum(key_col: str, val_col: str):
    """Order-fixed double sum: fold ``val`` in ``key`` order — the
    partition-independent (and DuckDB-reproducible,
    ``list_sum(list(v ORDER BY k))``) aggregation this module uses
    everywhere a double sum crosses a groupBy."""
    return F.aggregate(
        F.array_sort(F.collect_list(F.struct(key_col, val_col))),
        F.lit(0.0),
        lambda acc, s: acc + s.getField(val_col),
    )


def lr_quality_model(
    labeled: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    num_buckets: int = 512,
    iters: int = 8,
    learning_rate: float = 0.5,
    l2: float = 0.0,
    hash_family: str = "xxhash64",
    seed: int = 7,
    use_checkpoints: bool = True,
) -> DataFrame:
    """Train the ITERATIVE member of the CCNet/fastText quality-filter
    family — logistic regression by full-batch gradient descent over
    the same hashed bag-of-n-grams features NB and DSIR use — for the
    "my labels aren't NB-separable" user (NB's closed-form weights
    assume multinomial likelihoods; LR fits whatever linear boundary
    the labels actually have). Returns ``(bucket, weight)`` with one
    row per bucket in ``[0, num_buckets)`` plus ``bucket = -1`` holding
    the intercept — the same config-sized, always-broadcastable model
    contract as :func:`nb_quality_model`, persistable through
    functions/model_store.py.

    Fixed ``iters`` full-batch rounds (no convergence test — a data-
    dependent stop would make the trained weights unreproducible across
    engines), each: margins (broadcast model join + per-doc
    bucket-ordered fold) → sigmoid residuals → per-bucket gradient
    aggregation → driver-side weight update
    ``w ← w − lr·(Σ_d resid·x / n + l2·w)`` (no l2 on the intercept).
    The weights live on the DRIVER between rounds (num_buckets + 1
    floats — a bounded artifact, the BPE-merge-list class), so each
    round is a fresh short plan: no lineage nesting, no checkpoint
    churn, and the update arithmetic is plain IEEE doubles identical
    in Python and SQL.

    At 100 TB: per round, the corpus-sized work is one broadcast join
    against the model + one shuffle of ``(bucket, resid·x)`` partials —
    the same two-shuffle budget as NB scoring, times ``iters``. The
    feature table is computed once and pinned (tracked localCheckpoint)
    across rounds; ``use_checkpoints=False`` skips the pin and
    recomputes features per round (the fully-lazy escape hatch — the
    per-round driver jobs themselves are inherent to GD).

    Determinism: with ``hash_family="portable"`` every double sum folds
    in sorted (bucket / doc id) order, so training is bit-reproducible
    across partitionings and engine-reproducible to libm-``exp`` ulp —
    the DuckDB gate pins the score RANKING (plans/queries.py
    ``quality_lr_ranking``, the DSIR/BM25 convention) and
    tests/test_classifier.py property-tests the weights against a
    pure-Python recomputation. With the default xxhash64 family the
    cross-doc gradient sums use plain ``F.sum`` (map-side combinable,
    the production choice)."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        release_checkpoint,
        tracked_local_checkpoint,
    )

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if learning_rate <= 0:
        raise ValueError(f"learning_rate must be positive, got {learning_rate}")
    spark = labeled.sparkSession
    lab = F.col(label_col).cast("boolean")
    y = labeled.select(F.col(id_col), lab.cast("double").alias("__y"))
    x = _doc_features(labeled, id_col, text_col, num_buckets, hash_family, seed)
    # validate BEFORE pinning anything: a raise here must not leak
    # localCheckpoints (they survive until an external hygiene point)
    class_counts = y.groupBy("__y").count().collect()
    if any(r["__y"] is None for r in class_counts):
        raise ValueError(
            "lr_quality_model: NULL labels in training data — under "
            "xxhash64 F.sum would silently drop their residuals "
            "(biasing every update), under portable the sorted fold "
            "would poison the whole gradient; filter or fix them "
            "upstream"
        )
    n = sum(r["count"] for r in class_counts)
    if len(class_counts) < 2:
        raise ValueError(
            "lr_quality_model: training labels are one-class — the fit "
            "is a runaway intercept, not a classifier"
        )
    if use_checkpoints:
        x = tracked_local_checkpoint(x)
        y = tracked_local_checkpoint(y)
    sorted_folds = hash_family == "portable"
    # The bias gradient rides the per-bucket gradient aggregation as a
    # synthetic bucket -1 whose feature value is the constant 1.0:
    # r·1.0 ≡ r bit-exactly, and the sorted fold still runs in doc-id
    # order, so Σ rx over bucket -1 is the old resid fold unchanged.
    # One collect per GD round instead of two (guide §4.3 — batch the
    # driver round trips; at 8 iters this halves the job count).
    x_aug = x.unionByName(
        y.select(
            F.col(id_col),
            F.lit(-1).cast(dict(x.dtypes)["bucket"]).alias("bucket"),
            F.lit(1.0).alias("x"),
        )
    )
    weights = [0.0] * num_buckets
    bias = 0.0
    try:
        for _ in range(iters):
            wdf = spark.createDataFrame(
                [(b, w) for b, w in enumerate(weights)], "bucket int, weight double"
            )
            ll = (
                x.join(F.broadcast(wdf), "bucket")
                .select(id_col, "bucket", (F.col("x") * F.col("weight")).alias("t"))
                .groupBy(id_col)
                .agg(_sorted_fold_sum("bucket", "t").alias("ll"))
            )
            resid = (
                y.join(ll, id_col, "left")
                .select(
                    id_col,
                    (
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(-(F.lit(bias) + F.coalesce("ll", F.lit(0.0))))
                        )
                        - F.col("__y")
                    ).alias("r"),
                )
            )
            rx = x_aug.join(resid, id_col).select(
                "bucket", F.col(id_col), (F.col("r") * F.col("x")).alias("rx")
            )
            if sorted_folds:
                gb = rx.groupBy("bucket").agg(
                    _sorted_fold_sum(id_col, "rx").alias("g")
                )
            else:
                gb = rx.groupBy("bucket").agg(F.sum("rx").alias("g"))
            # <= num_buckets + 1 rows; bucket -1 is the bias gradient
            g = {r["bucket"]: r["g"] for r in gb.collect()}
            gbias = g.get(-1, 0.0)
            weights = [
                w - learning_rate * ((g.get(b, 0.0) / n) + l2 * w)
                for b, w in enumerate(weights)
            ]
            bias = bias - learning_rate * (gbias / n)
    finally:
        # a mid-training failure (a killed stage, a driver error)
        # must not leak the pinned feature/label frames
        if use_checkpoints:
            release_checkpoint(x)
            release_checkpoint(y)
    return spark.createDataFrame(
        [(-1, bias)] + [(b, w) for b, w in enumerate(weights)],
        "bucket int, weight double",
    )


def lr_quality_scores(
    corpus: DataFrame,
    labeled: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    num_buckets: int = 512,
    iters: int = 8,
    learning_rate: float = 0.5,
    l2: float = 0.0,
    hash_family: str = "xxhash64",
    seed: int = 7,
    model: DataFrame | None = None,
    use_checkpoints: bool = True,
) -> DataFrame:
    """Score every corpus document under the LR quality model:
    ``(id, score)`` with ``score = intercept + Σ_b w_b · x_b`` (the
    log-odds under the fitted model — positive means curated-like, the
    same deployment semantics as :func:`nb_quality_scores`). Pass
    ``model=lr_quality_model(...)`` (or a model_store reload) to score
    without retraining; otherwise it trains here from ``labeled``. A
    document with an empty feature bag scores the intercept alone. One
    broadcast join + one per-document bucket-ordered fold — identical
    scale shape to NB scoring."""
    if model is None:
        if labeled is None:
            raise ValueError("lr_quality_scores: pass labeled or model")
        model = lr_quality_model(
            labeled, id_col, text_col, label_col, num_buckets, iters,
            learning_rate, l2, hash_family, seed, use_checkpoints,
        )
    else:
        # a model trained with a different num_buckets silently
        # part-joins against the re-hashed features and scores garbage;
        # the model_store params check only guards the RELOAD path, so
        # guard direct DataFrame reuse here too (the nb footgun
        # convention). The model is config-sized — one tiny job.
        mx = model.agg(F.max("bucket").alias("mx")).collect()[0]["mx"]
        if mx is None:
            raise ValueError(
                "lr_quality_scores: the passed model frame is empty"
            )
        model_buckets = mx + 1
        if model_buckets != num_buckets:
            raise ValueError(
                f"lr_quality_scores: model was trained with "
                f"num_buckets={model_buckets} but scoring features hash "
                f"into num_buckets={num_buckets} — pass the matching "
                "num_buckets (mixed bucket spaces score garbage, not an "
                "error)"
            )
    bias = model.filter(F.col("bucket") == -1).select(
        F.col("weight").alias("__bias")
    )
    wdf = model.filter(F.col("bucket") >= 0)
    x = _doc_features(corpus, id_col, text_col, num_buckets, hash_family, seed)
    sums = (
        x.join(F.broadcast(wdf), "bucket")
        .select(id_col, "bucket", (F.col("x") * F.col("weight")).alias("t"))
        .groupBy(id_col)
        .agg(_sorted_fold_sum("bucket", "t").alias("ll"))
    )
    return (
        corpus.select(id_col)
        .join(sums, id_col, "left")
        .crossJoin(F.broadcast(bias))  # intercept: exactly one row
        .select(
            id_col,
            (F.coalesce(F.col("ll"), F.lit(0.0)) + F.col("__bias")).alias(
                "score"
            ),
        )
    )
