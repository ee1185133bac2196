"""Distinct-count sketching: K-Minimum-Values (KMV / bottom-k).

Spark already ships HyperLogLog++ (``approx_count_distinct``) — that
stays the production default for one-shot cardinalities. KMV earns its
place twice over:

- it is *mergeable by construction* (union of bottom-k sets → bottom-k
  of the union), the property a 100 TB pipeline needs to sketch per
  partition / per day and combine later without re-reading data;
- built on the portable md5 hash family (functions/hashing.py) its
  estimate is a pure deterministic function of the input set, so the
  DuckDB oracle can recompute it bit-identically — HLL's engine-private
  register layout never can. That puts cardinality estimation under the
  full value-hash gate instead of a rows-only check.

Estimator (Bar-Yossef et al. 2002): normalize the 60-bit hash to
``u = H / 2^60`` in (0,1); with ``u_(k)`` the k-th smallest *distinct*
hash, ``D ≈ (k-1) / u_(k)``; exact when the group has < k distinct
values. Standard error ≈ 1/sqrt(k-2).

Plan shape: distinct on (keys, hash) — map-side partial dedup then one
exchange — followed by a per-key sort-window that keeps rank ≤ k and a
final per-key agg. Every step is Catalyst built-ins; the window sort is
spillable, and per-key state after the rank filter is k rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64

#: 2^60 as an exact double — the normalizer for the 60-bit portable hash.
HASH_SPACE = float(1 << 60)


def kmv_distinct(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    k: int = 256,
    estimate_col: str = "kmv_estimate",
) -> DataFrame:
    """Per-key approximate COUNT(DISTINCT value) via a bottom-k sketch.

    Returns one row per key group: ``(*key_cols, <estimate_col>)``.
    ``value_col`` is cast to string before hashing (md5 is byte-wise),
    so cross-engine parity requires a type whose string form is stable —
    ints, strings, dates all qualify.
    """
    if k < 3:
        raise ValueError("KMV needs k >= 3 (stderr ~ 1/sqrt(k-2))")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = list(key_cols)
    hashed = df.select(*keys, portable_hash64(v.cast("string")).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    bottom = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    agg = bottom.groupBy(*keys).agg(
        F.max("__h").alias("__kth"), F.count(F.lit(1)).alias("__n")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        (F.lit(float(k - 1))) / (F.col("__kth") / F.lit(HASH_SPACE))
    )
    return agg.select(*keys, est.alias(estimate_col))


def kmv_bottom_k(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str | Column,
    k: int = 256,
) -> DataFrame:
    """The raw mergeable sketch: per key, the sorted array of its ≤ k
    smallest distinct hashes. Two sketches over disjoint (or
    overlapping) data merge with :func:`kmv_merge` — union the arrays,
    dedup, keep the k smallest — without touching the original rows."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    keys = list(key_cols)
    hashed = df.select(*keys, portable_hash64(v.cast("string")).alias("__h")).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmv_hashes"))
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, key_cols: Sequence[str], k: int = 256
) -> DataFrame:
    """Merge two bottom-k sketch tables (full outer on keys): bottom-k
    of the deduped union of hash arrays — the estimator over the merge
    equals the estimator over the concatenated inputs."""
    keys = list(key_cols)
    merged = (
        a.withColumnRenamed("kmv_hashes", "__ha")
        .join(b.withColumnRenamed("kmv_hashes", "__hb"), keys, "full")
        .select(
            *keys,
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.concat(
                            F.coalesce("__ha", F.array().cast("array<bigint>")),
                            F.coalesce("__hb", F.array().cast("array<bigint>")),
                        )
                    )
                ),
                1,
                k,
            ).alias("kmv_hashes"),
        )
    )
    return merged


def kmv_estimate_from_sketch(
    sketch: DataFrame, k: int = 256, estimate_col: str = "kmv_estimate"
) -> DataFrame:
    """Evaluate the estimator on a (possibly merged) bottom-k sketch."""
    n = F.size("kmv_hashes")
    kth = F.element_at("kmv_hashes", k)
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / (kth / F.lit(HASH_SPACE))
    )
    return sketch.select(
        *[c for c in sketch.columns if c != "kmv_hashes"], est.alias(estimate_col)
    )


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------
#
# Reference parity: the reference keeps exact frequency tables for its
# serving layer; at 100 TB an exact per-token count table is itself a
# large table, and pipelines usually want a bounded-memory frequency
# summary first (heavy-hitter gating, stopword discovery). CMS is the
# standard answer: a depth x width counter grid, estimate = min over
# rows, mergeable by element-wise addition.
#
# Built on the portable universal family (functions/hashing.py):
#   g_i(x) = ((a_i * (H(x) mod p) + b_i) mod p) mod width
# so the whole sketch — counters AND estimates — is a deterministic
# integer function of the input multiset, reproducible bit-identically
# in the DuckDB oracle. Plan shape: one posexplode (depth small, 4-8),
# one map-side-combined groupBy over at most depth*width keys. Counter
# rows shuffle; values never do.


def _cms_bucket_cols(
    value: Column, width: int, depth: int, seed: int, hash_family: str
) -> Column:
    """Array of ``depth`` bucket indices for one value. ``hash_family``
    follows the dedup convention: "fast" = xxhash64 (JVM-vectorized,
    ~5x cheaper, the 100 TB default), "portable" = the md5 family the
    DuckDB oracle can recompute bit-identically."""
    from hpc_hd_textreuse_etl_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
    )

    if hash_family == "portable":
        base = portable_hash64(value.cast("string"))
    elif hash_family == "fast":
        base = F.pmod(F.xxhash64(value.cast("string")), F.lit(1 << 60))
    else:
        raise ValueError(f"hash_family must be 'fast' or 'portable', got {hash_family!r}")
    hm = base % MERSENNE_P
    coeffs = minhash_coeffs(depth, seed=seed)
    return F.array(
        *[((F.lit(a) * hm + F.lit(b)) % MERSENNE_P) % F.lit(width) for a, b in coeffs]
    )


def cms_sketch(
    df: DataFrame,
    value_col: str | Column,
    width: int = 1024,
    depth: int = 4,
    seed: int = 11,
    weight_col: str | Column | None = None,
    hash_family: str = "fast",
) -> DataFrame:
    """Build the counter grid: one row per touched ``(depth, bucket)``
    with its total count (or sum of ``weight_col``). Untouched cells are
    implicit zeros — ``cms_lookup`` coalesces them back."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    w = (
        F.lit(1).cast("bigint")
        if weight_col is None
        else (F.col(weight_col) if isinstance(weight_col, str) else weight_col).cast(
            "bigint"
        )
    )
    return (
        df.select(
            F.posexplode(_cms_bucket_cols(v, width, depth, seed, hash_family)).alias(
                "depth", "bucket"
            ),
            w.alias("__w"),
        )
        .groupBy("depth", "bucket")
        .agg(F.sum("__w").alias("cms_count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise sum of two counter grids built with identical
    (width, depth, seed) — the linearity that makes CMS shardable."""
    return (
        a.unionByName(b)
        .groupBy("depth", "bucket")
        .agg(F.sum("cms_count").alias("cms_count"))
    )


def cms_lookup(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 11,
    estimate_col: str = "cms_estimate",
    hash_family: str = "fast",
) -> DataFrame:
    """Point-query the grid for each row of ``items``: estimate =
    min over depths of counter[g_i(item)], never an underestimate.
    The sketch side is tiny (<= depth*width rows) — broadcast it."""
    probes = items.select(
        F.col(item_col),
        F.posexplode(
            _cms_bucket_cols(F.col(item_col), width, depth, seed, hash_family)
        ).alias("depth", "bucket"),
    )
    joined = probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy(item_col).agg(
        F.min(F.coalesce("cms_count", F.lit(0))).alias(estimate_col)
    )


# ---------------------------------------------------------------------------
# Quantile sketch: hash-gated row sample + exact quantiles of the sample
# ---------------------------------------------------------------------------
#
# Spark ships approx_percentile (GK); like HLL its internal state is
# engine-private, so it can only ever get a rows-only check. This
# variant trades theory-grade worst-case bounds for two production
# properties: the "sketch" (a deterministic hash-gated sample of rows,
# operators/sampling.py) is mergeable by union and identical across
# engines, partitionings, and retries; and the estimator (type-1 /
# percentile_disc over the sample) is exact integer+compare arithmetic,
# so the full path sits under the DuckDB value-hash gate. Standard
# Bernoulli-sample quantile error: O(sqrt(log(1/d)/ (f*n))) rank error.


def quantile_sketch(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    sample_key_cols: Sequence[str],
    fraction: float = 0.1,
    salt: str = "qsk-v1",
) -> DataFrame:
    """The mergeable state: a hash-gated sample of ``(keys, value)``
    rows. ``sample_key_cols`` must identify a row (the gate hashes keys,
    not values, so duplicate values keep their multiplicity)."""
    from hpc_hd_textreuse_etl_spark.operators.sampling import hash_sample

    return hash_sample(df, list(sample_key_cols), fraction, salt=salt).select(
        *key_cols, value_col, *[c for c in sample_key_cols if c not in key_cols]
    )


def quantiles_from_sketch(
    sketch: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-key type-1 quantiles of the sampled rows: value at rank
    ``ceil(q * n)`` (clamped to >= 1) under ``ORDER BY value,
    tiebreak``. One window sort per key group; output is
    ``(*key_cols, quantile, value)``, one row per requested q."""
    keys = list(key_cols)
    order = [F.col(value_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*order)
    ranked = sketch.select(
        *keys, value_col, *tiebreak_cols
    ).withColumn("__rn", F.row_number().over(w)).withColumn(
        "__n", F.count(F.lit(1)).over(Window.partitionBy(*keys))
    )
    picks = None
    for q in qs:
        target = F.greatest(F.lit(1), F.ceil(F.lit(float(q)) * F.col("__n")))
        p = ranked.where(F.col("__rn") == target).select(
            *keys, F.lit(float(q)).alias("quantile"), F.col(value_col).alias("value")
        )
        picks = p if picks is None else picks.unionByName(p)
    return picks


# ---------------------------------------------------------------------------
# HyperLogLog (portable-register variant)
# ---------------------------------------------------------------------------


def hll_registers(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    p: int = 9,
) -> DataFrame:
    """HyperLogLog register table on the portable hash family —
    Flajolet et al.'s sketch with every register value an exact integer
    both engines can recompute (Spark's own ``approx_count_distinct``
    is HLL++ too, but its register layout is engine-private, so it can
    only ever get a rows-only check; this variant puts HLL itself under
    the DuckDB value-hash gate, the same reasoning as KMV above).

    The 60-bit hash splits as: low ``p`` bits → register index
    (``H & (2^p - 1)``), remaining ``60-p`` bits → the pattern whose
    leading-zero count is ranked. ``rho`` = position of the first 1-bit
    = ``(60 - p) - floor(log2(rest))`` computed exactly as
    ``61 - p - length(bin(rest))`` (binary-string length — no floating
    log); all-zero pattern → sentinel ``61 - p``.

    One map-side-combined ``max`` shuffle of ≤ 2^p counter rows per key
    group; registers never materialize per input row. Mergeable:
    element-wise max (:func:`hll_merge`). Returns
    ``(*keys, register, max_rho)`` — absent registers are empties
    (estimator counts them as zeros).
    """
    m = 1 << p
    v = F.col(value_col)
    h = portable_hash64(v.cast("string"))
    rest_bits = 60 - p
    rest = F.shiftright(h, p)
    rho = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(
            *keys,
            (h.bitwiseAND(F.lit(m - 1))).alias("register"),
            rho.cast("long").alias("rho"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(a: DataFrame, b: DataFrame, keys: Sequence[str] = ()) -> DataFrame:
    """Merge two register tables: element-wise max — the HLL union."""
    return (
        a.unionByName(b)
        .groupBy(*keys, "register")
        .agg(F.max("max_rho").alias("max_rho"))
    )


def hll_estimate(sketch: DataFrame, p: int = 9) -> float:
    """Cardinality estimate from a (single-group) register table.

    Standard HLL estimator: ``E = alpha_m · m² / Σ 2^(-M_j)`` with the
    small-range linear-counting correction (``E ≤ 2.5 m`` and empty
    registers exist → ``m · ln(m / V)``). The sketch is ≤ 2^p rows by
    construction, so collecting it is free; the float math happens
    driver-side AFTER the gated integer registers."""
    import math

    m = 1 << p
    rows = sketch.select("register", "max_rho").collect()
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1 + 1.079 / m)
    )
    denom = sum(2.0 ** -r.max_rho for r in rows) + (m - len(rows))  # empties: 2^0
    est = alpha * m * m / denom
    zeros = m - len(rows)
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# Bloom filter (portable-bitmap variant)
# ---------------------------------------------------------------------------


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 97,
) -> DataFrame:
    """Build a Bloom filter as a relational bitmap: ``(word, bits)``
    rows of 32-bit words (32 so ``1 << bit`` stays far from the int64
    sign bit in every engine). Bit positions come from the seeded
    universal family over the portable hash
    (functions/hashing.py) — k positions per value, ``word = pos >> 5``,
    ``bit = pos & 31`` — folded with one map-side-combined ``bit_or``
    shuffle of ≤ k rows per input value and ≤ m_bits/32 output rows.

    Spark's own ``bloom_filter_agg`` keeps the production one-shot
    path; this variant is (a) mergeable (:func:`bloom_merge` —
    element-wise OR), (b) cross-engine exact, so the filter CONTENT
    sits under the DuckDB gate, and (c) a relational value a
    broadcast-join prune (:func:`bloom_contains`) composes with
    directly.
    """
    from hpc_hd_textreuse_etl_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
    )

    base = portable_hash64(F.col(value_col).cast("string")) % F.lit(MERSENNE_P)
    pos_rows = df.select(
        F.explode(
            F.array(
                *[
                    ((F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P)
                     % F.lit(m_bits)).alias("p")
                    for a, b in minhash_coeffs(k, seed=seed)
                ]
            )
        ).alias("pos")
    )
    return (
        pos_rows.select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(1L, CAST(pos & 31 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two filters with identical (m_bits, k, seed): OR words."""
    return a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    probes: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 97,
    out_col: str = "might_contain",
) -> DataFrame:
    """Membership probe: ``out_col`` true iff ALL k bits are set — no
    false negatives, tunable false positives (the semi-join prune for
    100 TB: broadcast the ≤ m_bits/32-row bitmap against the big fact
    side and drop rows that cannot match before the real join).

    Plan: k probe positions explode, broadcast-join the bitmap on
    ``word`` (missing word ⇒ bit unset), then an all-bits-hit
    ``min`` re-group keyed by the probe's original columns.
    """
    from hpc_hd_textreuse_etl_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
    )

    cols = probes.columns
    base = portable_hash64(F.col(value_col).cast("string")) % F.lit(MERSENNE_P)
    pos_rows = probes.select(
        *cols,
        F.explode(
            F.array(
                *[
                    ((F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P)
                     % F.lit(m_bits))
                    for a, b in minhash_coeffs(k, seed=seed)
                ]
            )
        ).alias("pos"),
    ).select(
        *cols,
        F.shiftright(F.col("pos"), 5).alias("word"),
        F.col("pos").bitwiseAND(F.lit(31)).cast("int").alias("bit"),
    )
    joined = pos_rows.join(F.broadcast(bloom), "word", "left")
    hit = F.expr("shiftright(coalesce(bits, 0L), bit) & 1")
    return (
        joined.groupBy(*cols)
        .agg((F.min(hit) == 1).alias(out_col))
    )


def bloom_prune(
    df: DataFrame,
    value_col: str,
    bloom: DataFrame,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 97,
) -> DataFrame:
    """Zero-shuffle Bloom pre-filter: drop rows whose ``value_col``
    cannot be in the filter. Unlike :func:`bloom_contains` (a
    relational probe that re-groups), this collects the bitmap —
    bounded at m_bits/8 bytes, 8 KB at the default — into a literal
    array and evaluates the all-k-bits test as a codegen'd row
    predicate: row multiplicity is preserved and nothing shuffles.
    No false negatives (guaranteed supersets of the true matches);
    false-positive rows are eliminated by whatever exact operation
    follows."""
    if m_bits > (1 << 20):
        raise ValueError(
            f"bitmap too large to inline as a literal ({m_bits} bits); "
            "use bloom_contains for the relational probe path"
        )
    from hpc_hd_textreuse_etl_spark.functions.hashing import (
        MERSENNE_P,
        minhash_coeffs,
        portable_hash64,
    )

    words = {r["word"]: r["bits"] for r in bloom.collect()}
    arr = F.array(*[F.lit(words.get(w, 0)) for w in range(m_bits >> 5)])
    base = portable_hash64(F.col(value_col).cast("string")) % F.lit(MERSENNE_P)
    cond = F.lit(True)
    for a, b in minhash_coeffs(k, seed=seed):
        pos = (F.lit(a) * base + F.lit(b)) % F.lit(MERSENNE_P) % F.lit(m_bits)
        word = F.element_at(arr, (F.shiftright(pos, 5) + F.lit(1)).cast("int"))
        # F.shiftright only takes a literal shift; call the SQL
        # function directly for the column-valued bit index.
        hit = F.call_function(
            "shiftright", word, (pos.bitwiseAND(F.lit(31))).cast("int")
        ).bitwiseAND(F.lit(1))
        cond = cond & (hit == 1)
    return df.where(cond)


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 1 << 16,
    k: int = 5,
    seed: int = 97,
) -> DataFrame:
    """Semi-join reduction for big-fact ⋈ selective-dim: build the
    Bloom bitmap over the dim keys (one map-side-combined bit_or pass),
    prune the fact side with the zero-shuffle literal-bitmap predicate,
    then run the exact join on the survivors. Equivalent to the plain
    join (no false negatives; false positives die in the join), but at
    100 TB the fact rows that cannot match never enter the join
    exchange — the explicit form of the engine's runtime-filter
    pushdown, usable across materialization boundaries (build once,
    prune many downstream scans)."""
    bloom = bloom_bits(
        dim.select(F.col(dim_key).alias(dim_key)), dim_key, m_bits, k, seed
    )
    pruned = bloom_prune(fact, fact_key, bloom, m_bits, k, seed)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key])


def kmv_pairwise_overlap(
    sketches: DataFrame,
    key_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between sketch owners — corpus
    overlap audits ("how much of corpus B's vocabulary is already in
    A?") from bottom-k sketches ALONE, never the raw sets.

    Input: :func:`kmv_bottom_k` output (one ``kmv_hashes`` row per
    key). For each unordered key pair the union sketch is the bottom-k
    of the deduped array concat (in-row — the sketches are k-bounded,
    so the pair join carries k×8-byte arrays, not corpora), |A∪B| is
    the standard estimator on it, and |A∩B| follows by inclusion-
    exclusion (clamped at 0; the subtraction can go negative at sketch
    noise scale). Jaccard = inter/union. Everything downstream of the
    exact integer hash arrays is fixed-order IEEE — the whole overlap
    table sits under a value-hash gate like the base KMV estimator.

    Scale: |keys|² pairs of k-length arrays — pairwise overlap is for
    corpus/partition-level audits (tens to thousands of keys), not
    per-document pairs (that is MinHash-LSH's job, operators/dedup.py).
    """

    def est(n_col: Column, kth_col: Column) -> Column:
        return F.when(n_col < k, n_col.cast("double")).otherwise(
            F.lit(float(k - 1)) / (kth_col / F.lit(HASH_SPACE))
        )

    a = sketches.select(
        F.col(key_col).alias("key_a"), F.col("kmv_hashes").alias("__ha")
    )
    b = sketches.select(
        F.col(key_col).alias("key_b"), F.col("kmv_hashes").alias("__hb")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    union_arr = F.slice(
        F.array_sort(F.array_distinct(F.concat("__ha", "__hb"))), 1, k
    )
    out = pairs.withColumn("__u", union_arr).select(
        "key_a",
        "key_b",
        est(F.size("__ha"), F.element_at("__ha", k)).alias("est_a"),
        est(F.size("__hb"), F.element_at("__hb", k)).alias("est_b"),
        est(F.size("__u"), F.element_at("__u", k)).alias("est_union"),
    )
    inter = F.greatest(
        F.lit(0.0), F.col("est_a") + F.col("est_b") - F.col("est_union")
    )
    return out.withColumn("est_intersection", inter).withColumn(
        "jaccard", F.col("est_intersection") / F.col("est_union")
    )
