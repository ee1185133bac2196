"""Corpus-level token statistics: document frequencies, vocabulary
top-k, TF-IDF — the frequency layer a curation pipeline uses for
rare-token filtering, stopword discovery, and relevance weighting.

Scale shape: one explode of DISTINCT per-document tokens (dedup before
the explode is map-side reduction), one shuffle keyed on the token for
the DF aggregation — map-side combined, so the exchange carries (token,
partial count), not token occurrences. The TF join runs on the token
key; at corpus scale the vocabulary (≪ corpus) broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.text import tokens


def token_doc_frequency(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 1
) -> DataFrame:
    """``(token, df)`` — number of documents containing each token at
    least once (distinct-per-doc before counting)."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    out = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return out.filter(F.col("df") >= min_df) if min_df > 1 else out


def vocab_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 100
) -> DataFrame:
    """Top-k vocabulary by document frequency (token tiebreak → total
    order → stable across engines). Plans TakeOrderedAndProject: per-task
    k-row heaps, no global sort."""
    return (
        token_doc_frequency(df, id_col, text_col)
        .orderBy(F.desc("df"), F.asc("token"))
        .limit(k)
    )


def tf_idf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
) -> DataFrame:
    """``(id, token, tf, df, tf_idf)`` — smooth-idf weighting
    ``tf · (ln((N+1)/(df+1)) + 1)``.

    ``tf`` and ``df`` are exact integers (and what the oracle-gated
    query projects); ``tf_idf`` involves ``ln``, whose last-ulp behavior
    is libm-specific, so cross-engine checks on it belong in epsilon
    tests, not hash gates (tests/test_corpus_stats.py)."""
    n_docs = df.select(F.count(F.lit(1))).collect()[0][0]
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("token")
    )
    tf = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = token_doc_frequency(df, id_col, text_col, min_df)
    idf = F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0
    return tf.join(dfreq, "token").select(
        F.col(id_col),
        "token",
        "tf",
        "df",
        (F.col("tf") * idf).alias("tf_idf"),
    )


def cooccurrence_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 3,
    min_count: int = 1,
) -> DataFrame:
    """Symmetric token co-occurrence counts within a ±``window``
    position window — the exact integer core of PMI / word-vector /
    collocation statistics (PMI itself is a driver-side ``ln`` over
    these counts; like TF-IDF's ln-weight it stays OUT of the gated
    integers — see tests for the float layer).

    The naive spelling self-joins token positions per document and
    filters ``|i - j| <= window`` — O(L²) candidates per document, a
    scale-killer on long documents. This is the **shift-join** plan:
    for each offset k in 1..window, equi-join positions on
    ``(doc, pos + k)`` — candidates are exactly the true pairs
    (shuffle ∝ window × tokens, no quadratic stage, no skew from long
    documents). Pairs are ordered lexicographically so (a,b) and (b,a)
    accumulate together.

    Returns ``(x, y, n_xy, n_x, n_y)`` with unigram counts attached —
    everything downstream PMI needs: ``pmi = ln(n_xy · T / (n_x · n_y))``
    with T the total within-window pair count.
    """
    from hpc_hd_textreuse_etl_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("__doc"),
        F.posexplode(tokens(text_col)).alias("pos", "tok"),
    )
    left = toks.select("__doc", "pos", F.col("tok").alias("t1"))
    shifted = None
    for k in range(1, window + 1):
        s = toks.select(
            "__doc", (F.col("pos") - k).alias("pos"), F.col("tok").alias("t2")
        )
        shifted = s if shifted is None else shifted.unionAll(s)
    paired = left.join(shifted, ["__doc", "pos"]).select(
        F.least("t1", "t2").alias("x"), F.greatest("t1", "t2").alias("y")
    )
    n_xy = paired.groupBy("x", "y").agg(F.count(F.lit(1)).alias("n_xy"))
    uni = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    out = (
        n_xy.join(uni.select(F.col("tok").alias("x"), F.col("n").alias("n_x")), "x")
        .join(uni.select(F.col("tok").alias("y"), F.col("n").alias("n_y")), "y")
    )
    if min_count > 1:
        out = out.filter(F.col("n_xy") >= min_count)
    return out.select("x", "y", "n_xy", "n_x", "n_y")


def oov_stats(
    df: DataFrame, id_col: str, text_col: str, min_df: int = 2
) -> DataFrame:
    """Out-of-vocabulary scoring: per document, how many token
    occurrences fall outside the corpus vocabulary (tokens appearing in
    >= min_df documents). The vocabulary-coverage quality signal used
    to flag gibberish/boilerplate before training.

    ``(id, n_tokens, n_oov, oov_rate)`` — counts are exact integers;
    the rate is one per-row IEEE division. The vocab (token set with
    df >= min_df) broadcasts into the occurrence join (vocabulary ≪
    corpus — same argument as tf_idf); occurrences reduce map-side to
    per-document counts."""
    vocab = token_doc_frequency(df, id_col, text_col, min_df).select("token")
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    marked = tok.join(
        F.broadcast(vocab.withColumn("__in_v", F.lit(1))), "token", "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("__in_v").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .withColumn(
            "oov_rate", F.col("n_oov").cast("double") / F.col("n_tokens")
        )
    )


# ---------------------------------------------------------------------------
# Bigram language-model scoring (perplexity-style quality gate)
# ---------------------------------------------------------------------------


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """``(id, w1, w2)`` — one row per adjacent token pair, in document
    order. The pairing happens INSIDE the row (a Catalyst ``transform``
    over a sliced token array + 1-based ``element_at`` for the
    successor), so producing bigrams is part of the scan stage: zero
    shuffle, no positional self-join, no window."""
    toks = tokens(text_col)
    n = F.size(toks)
    pairs = F.transform(
        F.slice(toks, F.lit(1), F.greatest(n - 1, F.lit(0))),
        lambda t, i: F.struct(
            t.alias("w1"), F.element_at(toks, i + F.lit(2)).alias("w2")
        ),
    )
    return df.select(F.col(id_col), F.explode(pairs).alias("bg")).select(
        id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )


def bigram_counts(
    df: DataFrame, id_col: str, text_col: str, min_count: int = 1
) -> DataFrame:
    """Corpus bigram table ``(w1, w2, n_xy)`` — one map-side-combined
    shuffle keyed on the pair. ``min_count`` prunes the hapax tail,
    which at web scale is what makes the table broadcastable."""
    out = doc_bigrams(df, id_col, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    )
    return out.filter(F.col("n_xy") >= min_count) if min_count > 1 else out


def bigram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    counts: DataFrame | None = None,
    add_k: float = 1.0,
) -> DataFrame:
    """Per-document bigram language-model familiarity — the
    perplexity-style quality gate of training-data curation (docs whose
    adjacent-pair statistics diverge from the corpus are gibberish,
    boilerplate, or the wrong language).

    Emits an exact integer core plus a float convenience layer:

    - ``n_bigrams``       — adjacent pairs in the document;
    - ``sum_bigram_n``    — Σ corpus count of each pair (unseen = 0);
    - ``unseen_bigrams``  — pairs never seen in the (possibly pruned)
      corpus table;
    - ``avg_logprob``     — mean ln((n_xy + k) / (n_x + k·V)), add-k
      smoothed conditional bigram model (float layer: ln is libm, so
      it is epsilon-tested, not oracle-gated — same reasoning as
      TF-IDF's idf).

    Scale shape: doc bigrams reduce map-side onto the (w1, w2) join
    key; the counts table (min_count-pruned) is the small side. The
    unigram table and the 1-row vocab size broadcast."""
    if counts is None:
        counts = bigram_counts(df, id_col, text_col)
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("n_x"))
    vsize = uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))

    bg = doc_bigrams(df, id_col, text_col)
    joined = (
        bg.join(counts, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("token", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vsize))
    )
    logp = F.log(
        (F.coalesce(F.col("n_xy"), F.lit(0)).cast("double") + F.lit(add_k))
        / (
            F.coalesce(F.col("n_x"), F.lit(0)).cast("double")
            + F.lit(add_k) * F.col("v").cast("double")
        )
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.sum(F.coalesce(F.col("n_xy"), F.lit(0))).cast("bigint").alias("sum_bigram_n"),
        F.sum(F.when(F.col("n_xy").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("unseen_bigrams"),
        F.avg(logp).alias("avg_logprob"),
    )


def label_association(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    min_count: int = 1,
) -> DataFrame:
    """Chi-square token–label association — the classic feature-selection
    / domain-signature statistic ("which tokens characterize this
    language / source / topic?").

    For every (token, label): the 2×2 document-level contingency table

        n11 = docs with token, with label     n10 = with token, other label
        n01 = without token, with label       n00 = neither

    as EXACT integers (derived from three aggregates: per-(token,label)
    doc counts, per-token doc counts, per-label doc counts + the grand
    total — no second scan of the text), plus the float ``chi2`` score
    strictly downstream of the integers.

    Scale shape: one explode of DISTINCT per-doc tokens → map-side
    combined counts keyed (token, label); the per-token marginal joins
    on the token key; the per-label marginal and the 1-row total
    broadcast. ``min_count`` prunes the (token, label) tail before the
    joins."""
    present = df.select(
        F.col(id_col),
        F.col(label_col).alias("label"),
        F.explode(F.array_distinct(tokens(text_col))).alias("token"),
    )
    n11 = present.groupBy("token", "label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n11")
    )
    if min_count > 1:
        n11 = n11.filter(F.col("n11") >= min_count)
    n_token = present.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_token")
    )
    n_label = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_label")
    )
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))

    out = (
        n11.join(n_token, "token")
        .join(F.broadcast(n_label), "label")
        .crossJoin(F.broadcast(total))
    )
    n10 = F.col("n_token") - F.col("n11")
    n01 = F.col("n_label") - F.col("n11")
    n00 = F.col("n_docs") - F.col("n_token") - F.col("n_label") + F.col("n11")
    # float layer in double end-to-end: at web scale the cross products
    # overflow bigint (ANSI would raise); the gated columns stay integer
    d = lambda c: c.cast("double")  # noqa: E731
    num = d(F.col("n_docs")) * F.pow(
        d(F.col("n11")) * d(n00) - d(n10) * d(n01), F.lit(2.0)
    )
    den = (
        (d(F.col("n11")) + d(n10))
        * (d(n01) + d(n00))
        * (d(F.col("n11")) + d(n01))
        * (d(n10) + d(n00))
    )
    return out.select(
        "token",
        "label",
        "n11",
        "n_token",
        "n_label",
        "n_docs",
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("chi2"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 top-k retrieval for one term query — the ranking layer
    over the tf/df statistics above, as a pure Catalyst plan.

    ``score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` (the max(0,·)
    variant is monotone-equal here since df ≤ N).

    Determinism across engines: per-term contributions are computed as
    SEPARATE pivoted columns and added in the *written* term order —
    never via a groupBy-sum whose accumulation order is partition-
    dependent — so the only cross-engine wobble is the libm ``ln`` ulp.
    Scores are therefore gated on (doc, rank) with a doc_id tiebreak
    (the matmul-ANN precedent) and epsilon-tested on value.

    Scale shape: the term filter lands BEFORE the tf aggregation, so
    only postings of the |q| query terms are ever shuffled; N/avgdl and
    the per-term df are 1-row/|q|-row broadcast aggregates; the final
    top-k plans TakeOrderedAndProject (per-task heaps, no global sort).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct")

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("double").alias("total_dl"),
    )

    qtok = tok.where(F.col("token").isin(list(query_terms)))
    tf = qtok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("df"))

    # one row per candidate doc, one tf column per term, in query order.
    # Both pivots are renamed POSITIONALLY (__tf_i / __df_i): raw term
    # strings as column names would break on backticks and collide with
    # the internal dl/n_docs/total_dl columns.
    wide = (
        tf.groupBy(id_col)
        .pivot("token", list(query_terms))
        .agg(F.first("tf"))
        .toDF(id_col, *[f"__tf_{i}" for i in range(len(query_terms))])
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(
            F.broadcast(
                dfreq.groupBy().pivot("token", list(query_terms)).agg(F.first("df"))
            ).toDF(*[f"__df_{i}" for i in range(len(query_terms))])
        )
    )
    avgdl = F.col("total_dl") / F.col("n_docs").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for i, term in enumerate(query_terms):
        tf_t = F.coalesce(F.col(f"__tf_{i}").cast("double"), F.lit(0.0))
        df_t = F.coalesce(F.col(f"__df_{i}").cast("double"), F.lit(0.0))
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - df_t + F.lit(0.5)) / (df_t + F.lit(0.5))
        )
        score = score + idf * (tf_t * F.lit(k1 + 1.0)) / (tf_t + norm)
    scored = wide.select(F.col(id_col), score.alias("score"))
    # top-k FIRST (TakeOrderedAndProject — per-task heaps over the full
    # candidate set), then the rank window runs on ≤ k rows only.
    topk = scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
    from pyspark.sql import Window

    # rank window runs AFTER the limit, over ≤ k rows — benign
    # single-partition trip (SCALE.md "Unpartitioned windows")
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return topk.withColumn("rank", F.row_number().over(w).cast("int")).select(
        id_col, "rank", "score"
    )


def feature_hash_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int = 64,
    salt: str = "fh-v1",
) -> DataFrame:
    """Hashing-trick vectorizer (long form): ``(id, bucket, n)`` with
    ``bucket = H(salt‖token) mod n_buckets`` over raw token occurrences
    — the fixed-dimension, vocabulary-free featurization used when the
    vocab is unbounded or must not be materialized (streaming text,
    adversarial tokens). Uses the portable 60-bit md5 family, so bucket
    placement is engine- and run-stable and the whole sparse matrix
    sits under a value-hash gate.

    Scale shape: explode → ONE map-side-combined shuffle on
    (id, bucket); no vocabulary table, no broadcast, no second pass —
    the defining advantage of feature hashing over tf_idf's df join."""
    from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64

    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    bucket = (
        portable_hash64(F.concat_ws("|", F.lit(salt), F.col("token")))
        % F.lit(n_buckets)
    ).cast("int")
    return (
        tok.withColumn("bucket", bucket)
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
