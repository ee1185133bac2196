"""Similarity search over embedding columns.

Two paths, matching how ANN is actually run on Spark at scale:

- :func:`cosine_topk` — exact brute-force top-k: block-nested-loop as a
  (optionally broadcast) join + window rank. The baseline, and the right
  answer when the query set is small.
- :func:`lsh_topk` — random-hyperplane LSH buckets bound the candidate
  set; exact cosine re-ranking inside buckets. The scale path when both
  sides are large: candidate generation is an equi-join on bucket keys,
  never all-pairs. Hyperplanes are derived from xxhash64 (seeded,
  reproducible, no stored model state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.hashing import hyperplane_coeffs
from hpc_hd_textreuse_etl_spark.operators.dedup import cosine, vector_norm


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    broadcast_queries: bool = True,
    strategy: str = "fold",
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``(query_id, neighbor_id, cosine, rank)``; self-matches excluded.
    The small side is broadcast so the big side streams without a
    shuffle; ranking shuffles only (query_id, neighbor, score) triples.

    ``strategy``:

    - ``"fold"`` (default): per-pair Catalyst higher-order fold. Stays
      entirely JVM-side and is bit-identical to the DuckDB oracle's
      sequential ``list_sum`` — the correctness-gate path.
    - ``"matmul"``: Arrow-batched BLAS path (:func:`cosine_topk_matmul`).
      The fold evaluates one lambda per vector element per pair — at
      dim=768 over a corpus-scale pairwise workload that is the
      bottleneck; a (batch × dim)·(dim × q) matmul scores a whole Arrow
      batch against every query in one BLAS call. Summation order
      differs from the fold (pairwise/SIMD vs sequential), so scores
      can differ in the last ~ulp; ranks are identical except under
      exact ties already broken by neighbor_id.
    """
    if strategy == "matmul":
        return cosine_topk_matmul(queries, corpus, id_col, vec_col, k)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        vector_norm(F.col(vec_col)).alias("q_norm"),
    )
    if broadcast_queries:
        q = F.broadcast(q)
    from hpc_hd_textreuse_etl_spark.functions.skew import spread_small_input

    # the per-pair cosine folds below run on the corpus side of the
    # broadcast join, under the first exchange — an under-partitioned
    # corpus (single row group) serializes every fold on one core
    # (guide §2.5); no-op on split inputs. Spread BEFORE the norm
    # projection so the fold work itself parallelizes.
    c = spread_small_input(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col))
    ).select(
        F.col("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        vector_norm(F.col(vec_col)).alias("c_norm"),
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine(F.col("q_vec"), F.col("c_vec"), F.col("q_norm"), F.col("c_norm")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


#: integer Spark SQL types accepted as vector ids by the matmul path.
_INT_ID_TYPES = {"tinyint", "smallint", "int", "bigint"}


def cosine_topk_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    query_chunk_rows: int = 65_536,
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched BLAS — the scale path for
    wide embeddings (see :func:`cosine_topk` ``strategy="matmul"``).

    The query set is streamed to the driver (it is the side
    :func:`cosine_topk` broadcasts anyway), L2-normalized into float64
    matrices of at most ``query_chunk_rows`` rows, and each chunk is
    shipped to executors inside its own ``mapInPandas`` closure. Each
    corpus Arrow batch is scored against the whole chunk in a single
    ``(batch × dim) @ (dim × chunk)`` matmul, and only the per-batch
    top-k rows per query leave Python — the shuffle feeding the final
    global rank carries at most ``k × q`` rows per batch, independent of
    corpus size.

    Chunking bounds driver AND closure memory at
    ``query_chunk_rows × dim`` float64 (default 65 536 × 768 ≈ 400 MB);
    the cost of an extra chunk is one more corpus scan, so at 100 TB
    size ``query_chunk_rows`` to the largest closure the executors can
    hold. Per-chunk results are unioned before the single global rank
    window, so the output is chunking-invariant (asserted in
    tests/test_similarity.py).

    Ids may be any integer type or strings (matching the fold path);
    zero-norm vectors score 0.0 against everything instead of NaN, so
    degenerate embeddings sink to the bottom of the ranking rather than
    poisoning it.
    """
    import numpy as np
    import pandas as pd

    id_type = dict(queries.dtypes).get(id_col)
    int_ids = id_type in _INT_ID_TYPES
    id_sql = "long" if int_ids else "string"
    out_schema = f"query_id {id_sql}, neighbor_id {id_sql}, cosine double"
    np_id_dtype = np.int64 if int_ids else object

    def _norm_rows(mat: "np.ndarray") -> "np.ndarray":
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        return mat / np.where(norms == 0.0, 1.0, norms)

    corpus_sel = corpus.select(
        F.col(id_col).alias("nid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("nv"),
    )

    def chunk_scored(q_ids: "np.ndarray", q_mat: "np.ndarray") -> DataFrame:
        def score(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                n_ids = pdf["nid"].to_numpy(dtype=np_id_dtype)
                c_mat = _norm_rows(np.array(list(pdf["nv"]), dtype=np.float64))
                sims = c_mat @ q_mat.T  # (batch × chunk)
                sims[n_ids[:, None] == q_ids[None, :]] = -np.inf  # self-matches
                kk = min(k, sims.shape[0])
                # per-batch prune: only each query's batch-local top-k survive
                top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (k × chunk)
                qcol = np.broadcast_to(q_ids, top.shape).ravel()
                ncol = n_ids[top.ravel()]
                scol = np.take_along_axis(sims, top, axis=0).ravel()
                keep = scol > -np.inf
                yield pd.DataFrame(
                    {"query_id": qcol[keep], "neighbor_id": ncol[keep],
                     "cosine": scol[keep]}
                )

        return corpus_sel.mapInPandas(score, schema=out_schema)

    # Stream the query side in chunks — the driver never materializes
    # more than query_chunk_rows vectors at once.
    q_iter = queries.select(
        F.col(id_col).alias("qid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
    ).toLocalIterator()

    scored: DataFrame | None = None
    ids_buf: list = []
    vec_buf: list = []

    def flush():
        nonlocal scored, ids_buf, vec_buf
        if not ids_buf:
            return
        q_ids = np.array(ids_buf, dtype=np_id_dtype)
        q_mat = _norm_rows(np.array(vec_buf, dtype=np.float64))
        part = chunk_scored(q_ids, q_mat)
        scored = part if scored is None else scored.unionAll(part)
        ids_buf, vec_buf = [], []

    for row in q_iter:
        ids_buf.append(row.qid)
        vec_buf.append(row.qv)
        if len(ids_buf) >= query_chunk_rows:
            flush()
    flush()

    if scored is None:
        schema = f"query_id {id_sql}, neighbor_id {id_sql}, cosine double, rank int"
        return corpus.sparkSession.createDataFrame([], schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hyperplane_bucket(vec_col: str, num_planes: int = 12, seed: int = 42, dim: int = 64):
    """Sign-bit bucket id from ``num_planes`` pseudo-random hyperplanes.

    Plane coefficients are xxhash64(d, p, seed) mapped to [-1, 1] — no
    stored model, identical on every executor. Returns a long column.
    """
    v = F.col(vec_col)

    def plane_dot(p: int):
        # dot(vec, plane_p) via fold over element index
        return F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, d: x.cast("double")
                * (
                    (
                        F.pmod(
                            F.xxhash64(d, F.lit(p), F.lit(seed)), F.lit(2_000_001)
                        ).cast("double")
                        - 1_000_000.0
                    )
                    / 1_000_000.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    out = F.lit(0).cast("long")
    for p in range(num_planes):
        out = out + F.when(
            plane_dot(p) > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(F.lit(0).cast("long"))
    return out


def hyperplane_bucket_literal(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id from driver-precomputed hyperplane coefficient
    arrays (functions/hashing.py ``hyperplane_coeffs``) inlined as
    literals. Cheaper than :func:`hyperplane_bucket` (no per-row hash
    work for constants) and bit-reproducible in the DuckDB oracle — the
    same coefficients are inlined into the oracle SQL."""
    v = F.col(vec_col)
    out = F.lit(0).cast("long")
    for p, coeffs in enumerate(planes):
        arr = F.array(*[F.lit(c) for c in coeffs])
        dot_p = F.aggregate(
            F.zip_with(v, arr, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(
            dot_p > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(F.lit(0).cast("long"))
    return out


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    lloyd_iters: int = 2,
    seed: int = 42,
    dim: int = 64,
    hash_family: str = "xxhash64",
    assign_strategy: str = "fold",
    use_checkpoints: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """IVF coarse quantizer: ``(centroids, assignments)``.

    ``assign_strategy="matmul"`` routes every nearest-centroid pass
    (Lloyd rounds and the final assignment) through the Arrow/BLAS
    path (:func:`_assign_cells`) — the production choice for wide
    embeddings; keep the default ``"fold"`` for the portable
    oracle-gated family. The two are mutually exclusive with
    ``hash_family="portable"``: BLAS summation order differs from the
    sequential fold by ~1 ulp, which can flip near-tied cell
    assignments and silently void the portable family's cross-engine
    bit-reproducibility contract — that combination raises.

    ``use_checkpoints=False`` keeps the whole index LAZY: no eager
    tracked ``localCheckpoint`` per Lloyd round, so plan construction
    runs no jobs and no executor blocks are pinned — the escape hatch
    for callers that build many indexes in a loop without reaching a
    ``release_local_checkpoints()`` hygiene point, at the cost of
    re-executing the Lloyd prefix once per downstream consumer. With
    the default ``True``, looping callers MUST call
    ``functions.checkpoints.release_local_checkpoints()`` between
    iterations or the final round's pin accumulates per call.

    Centroids initialize from a deterministic hash-sample of the corpus
    (k seeded picks), then ``lloyd_iters`` rounds of assign + mean — all
    DataFrame ops (groupBy + posexplode/collect for the element-wise
    mean), no MLlib dependency. Returns
    ``centroids (cell_id, centroid array<double>)`` and
    ``assignments (id, cell_id)``.

    ``hash_family="portable"`` makes the whole index reproducible in the
    DuckDB oracle: the init sample uses the md5-based portable hash, and
    the centroid mean is a fold over the SORTED member values instead of
    ``avg()`` — double addition is not associative, so a fixed summation
    order is what makes the centroids (hence assignments) bit-identical
    across engines and across reruns.
    """
    from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64

    if hash_family == "portable" and assign_strategy == "matmul":
        raise ValueError(
            "hash_family='portable' requires assign_strategy='fold': the "
            "BLAS matmul path sums in a different order (~1 ulp), which can "
            "flip near-tied cell assignments and break the portable "
            "family's cross-engine bit-reproducibility contract"
        )
    vecs = corpus.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # deterministic init: the n_cells corpus vectors with smallest
    # seeded hash — a seeded uniform sample without rand()
    if hash_family == "portable":
        h = portable_hash64(F.concat(F.col("vid").cast("string"), F.lit(f"#{seed}")))
    else:
        h = F.xxhash64(F.col("vid"), F.lit(seed))
    init = (
        vecs.withColumn("h", h)
        .orderBy("h")
        .limit(n_cells)
        .select(
            # over ≤ n_cells seed rows (post-limit) — benign single-
            # partition trip (SCALE.md "Unpartitioned windows")
            F.row_number().over(Window.orderBy("h")).alias("cell_id"),
            F.col("v").alias("centroid"),
        )
    )

    def mean_centroids(assigned: DataFrame) -> DataFrame:
        # element-wise mean: explode positions, aggregate per (cell, pos),
        # re-collect in position order
        per_pos = assigned.join(vecs, "vid").select(
            "cell_id", F.posexplode("v").alias("pos", "x")
        )
        if hash_family == "portable":
            # order-fixed summation: sort members, sequential fold
            cell_pos = (
                per_pos.groupBy("cell_id", "pos")
                .agg(F.array_sort(F.collect_list("x")).alias("xs"))
                .select(
                    "cell_id",
                    "pos",
                    (
                        F.aggregate("xs", F.lit(0.0), lambda a, x: a + x)
                        / F.size("xs")
                    ).alias("m"),
                )
            )
        else:
            cell_pos = per_pos.groupBy("cell_id", "pos").agg(F.avg("x").alias("m"))
        return (
            cell_pos.groupBy("cell_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cell_id",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
            )
        )

    # Each Lloyd round's centroid table is <= n_cells rows but its LAZY
    # plan nests the entire previous round (assign -> mean -> assign ...):
    # left unmaterialized, every downstream use of `centroids` /
    # `assignments` re-executes the whole chain — the round-8 profile
    # measured semantic_dedup paying the Lloyd prefix 4x. Each round is
    # pinned via a TRACKED eager localCheckpoint (values unchanged — the
    # oracle gates pin this); the superseded round releases immediately,
    # and the final table's pin is freed by release_local_checkpoints()
    # at the registry hygiene point, so looping callers don't accumulate
    # one pinned table per call (functions/checkpoints.py).
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        release_checkpoint,
        tracked_local_checkpoint,
    )

    centroids = init
    prev = None
    for _ in range(lloyd_iters):
        nxt = mean_centroids(_assign_cells(vecs, centroids, assign_strategy))
        if use_checkpoints:
            if assign_strategy == "matmul":
                # The matmul assign collects the centroids to the driver
                # anyway (n_cells × dim — the side the fold path
                # broadcasts), so pin each round as a DRIVER-LOCAL
                # literal: the collect IS the round's one job, the next
                # pass reads a LocalRelation (no re-collect job), and
                # there is no checkpoint block to track or release
                # (guide §4.3 driver round trips). Exact: a collected
                # double round-trips bit-identically through
                # createDataFrame.
                nxt = corpus.sparkSession.createDataFrame(
                    nxt.collect(), schema=nxt.schema
                )
            else:
                nxt = tracked_local_checkpoint(nxt)
                if prev is not None:
                    release_checkpoint(prev)
        centroids, prev = nxt, nxt
    assignments = _assign_cells(vecs, centroids, assign_strategy).select(
        F.col("vid").alias(id_col), "cell_id"
    )
    return centroids, assignments


def _assign_cells(
    vecs: DataFrame, centroids: DataFrame, strategy: str = "fold"
) -> DataFrame:
    """Nearest centroid by cosine for every vector (centroids broadcast).

    ``strategy="fold"`` (default, cross-engine-exact): the argmax is a
    ``max(struct(sim, -cell_id))`` hash aggregation —
    partial-aggregatable (map-side combine reduces each task to one row
    per vector BEFORE the exchange), where the previous row_number
    window had to shuffle and sort every (vector × centroid) candidate
    row. Tie semantics are identical: highest sim, then smallest
    cell_id (struct comparison is field-ordered, so negating cell_id
    makes the smaller id win the max).

    ``strategy="matmul"``: one Arrow-batched BLAS ``(batch × dim) @
    (dim × cells)`` per batch with the (tiny) centroid matrix inlined
    into the closure — no per-candidate row ever exists, no shuffle at
    all (the aggregation disappears). The round-8 profile measured the
    interpreted HOF cosine fold as ~5× the matmul cost per Lloyd pass
    at 20k×64-dim. Same argmax tie rule (columns ordered by cell_id;
    ``np.argmax`` takes the first maximum). BLAS summation order
    differs from the sequential fold by ~1 ulp, so near-tied centroids
    can assign differently — the production (xxhash64) trade, same as
    ``cosine_topk(strategy="matmul")``; the portable oracle path keeps
    the fold."""
    if strategy == "matmul":
        return _assign_cells_matmul(vecs, centroids)
    scored = vecs.crossJoin(F.broadcast(centroids)).withColumn(
        "sim", cosine(F.col("v"), F.col("centroid"))
    )
    return (
        scored.groupBy("vid")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("cell_id")).alias("nc"))).alias("b"))
        .select("vid", (-F.col("b.nc")).cast("int").alias("cell_id"))
    )


def _assign_cells_matmul(vecs: DataFrame, centroids: DataFrame) -> DataFrame:
    """BLAS nearest-centroid assignment (see :func:`_assign_cells`).
    Centroids are collected to the driver (n_cells × dim — the side the
    fold path broadcasts anyway) and normalized once; each Arrow batch
    of vectors is assigned in a single matmul. Zero-norm vectors score
    0.0 against every centroid and take cell 1 by the tie rule (the
    fold path's NaN would also pick a fixed cell; degenerate inputs are
    out of contract either way)."""
    import numpy as np
    import pandas as pd

    id_sql = "long" if dict(vecs.dtypes)["vid"] in _INT_ID_TYPES else "string"

    rows = sorted(centroids.collect(), key=lambda r: r["cell_id"])
    cell_ids = np.array([r["cell_id"] for r in rows], dtype=np.int32)
    c_mat = np.array([r["centroid"] for r in rows], dtype=np.float64)
    c_norms = np.linalg.norm(c_mat, axis=1, keepdims=True)
    c_mat = c_mat / np.where(c_norms == 0.0, 1.0, c_norms)

    def assign(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            m = np.array(list(pdf["v"]), dtype=np.float64)
            norms = np.linalg.norm(m, axis=1, keepdims=True)
            m = m / np.where(norms == 0.0, 1.0, norms)
            best = np.argmax(m @ c_mat.T, axis=1)  # first max = smallest cell
            yield pd.DataFrame(
                {"vid": pdf["vid"], "cell_id": cell_ids[best]}
            )

    return vecs.mapInPandas(assign, schema=f"vid {id_sql}, cell_id int")


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    seed: int = 42,
    hash_family: str = "xxhash64",
    use_checkpoints: bool = True,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` nearest cells per
    query, exact cosine rank within the probed inverted lists.

    The scale path when LSH bucket skew bites: cell sizes are balanced
    by Lloyd refinement, candidate cost ≈ corpus × n_probe / n_cells,
    and the only broadcast is the (tiny) centroid table.
    ``use_checkpoints`` passes through to :func:`ivf_index` (the lazy
    escape hatch for looping callers)."""
    centroids, assignments = ivf_index(
        corpus, id_col, vec_col, n_cells, lloyd_iters, seed,
        hash_family=hash_family, use_checkpoints=use_checkpoints,
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qvec"),
    )
    probes = (
        qv.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col("qvec"), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cell_id"))
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", "cell_id")
    )
    lists = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    ).join(assignments.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    cands = (
        probes.withColumn("q_norm", vector_norm(F.col("qvec")))
        .join(lists.withColumn("n_norm", vector_norm(F.col("nvec"))), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            cosine(F.col("qvec"), F.col("nvec"), F.col("q_norm"), F.col("n_norm")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return cands.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
    seed: int = 42,
    dim: int = 64,
    plane_source: str = "xxhash64",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket in
    ≥1 of ``num_tables`` tables; exact cosine rank within candidates.

    Recall grows with num_tables; cost is num_tables equi-joins on
    (table, bucket) — each a bounded shuffle, never a cross join.

    ``plane_source="literal"`` uses driver-precomputed seeded
    coefficients inlined as literal arrays (reproducible in the DuckDB
    oracle); the default derives coefficients from xxhash64 per row."""
    literal_planes = (
        hyperplane_coeffs(num_tables, num_planes, dim, seed)
        if plane_source == "literal"
        else None
    )

    def bucket(t: int) -> Column:
        if literal_planes is not None:
            return hyperplane_bucket_literal(vec_col, literal_planes[t])
        return hyperplane_bucket(vec_col, num_planes, seed + t, dim)

    def with_buckets(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.posexplode(F.array(*[bucket(t) for t in range(num_tables)])).alias(
                "table", "bucket"
            ),
        )

    qb = with_buckets(queries, "query")
    cb = with_buckets(corpus, "neighbor")
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.withColumn(
        "cosine",
        cosine(
            F.col("query_vec"),
            F.col("neighbor_vec"),
            vector_norm(F.col("query_vec")),
            vector_norm(F.col("neighbor_vec")),
        ),
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the memory-bounded tier)
# ---------------------------------------------------------------------------


def _normalize(vec: Column) -> Column:
    """L2-normalize a float-array column in double (order-fixed fold —
    deterministic, bit-identical to the DuckDB oracle). An all-zero
    vector keeps its zeros (norm 0 never divides)."""
    dv = F.transform(vec, lambda x: x.cast("double"))
    nrm = vector_norm(vec)
    return F.when(nrm == F.lit(0.0), dv).otherwise(
        F.transform(dv, lambda x: x / nrm)
    )


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ks: int = 16,
    pq_iters: int = 1,
    seed: int = 42,
    dim: int = 64,
    hash_family: str = "xxhash64",
    use_checkpoints: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization codebooks + codes (Jégou et al. 2011):
    ``(codebooks (j, code, centroid), codes (id, j, code))``.

    Vectors are L2-normalized, split into ``m`` contiguous subspaces of
    ``dim/m`` components, and each subspace is k-means-quantized to
    ``ks`` centroids (seeded deterministic init — the ``ks`` corpus
    vectors with smallest salted hash, same device as ``ivf_index`` —
    then ``pq_iters`` Lloyd rounds with L2 assignment). A code cell
    that loses all members simply drops out of the next round's
    codebook (its members reassign) — both engines drop it
    identically, so the oracle stays exact.

    ``pq_iters=1`` is a QUALITY FLOOR, not a typical operating point:
    one Lloyd round after the seeded init is the cheapest codebook that
    still clears the recall gate (``ann_ivfpq_recall``), and it keeps
    the oracle's unroll small. Production codebooks usually run Lloyd
    to near-stationarity — pass ``pq_iters≈10`` (each extra round is
    one more broadcast-join + means pass over the corpus; train once
    and persist via functions/model_store.py rather than re-deriving).

    Why this is THE memory-bounded ANN tier at 100 TB: a candidate's
    footprint during scanning falls from ``dim·4`` bytes of floats to
    ``m`` small codes (64-dim float32 → 8 bytes at m=8: 32×), and
    scoring needs only a per-query lookup table over ``m·ks`` entries
    (ADC — see :func:`ivfpq_topk`). All training passes are DataFrame
    ops: assignment is a broadcast join (codebooks are ``m·ks`` rows —
    a config, not the data) + per-(vector, subspace) struct-min;
    means shuffle ``(j, code, pos, x)`` quadruples. With
    ``hash_family="portable"`` init, means (sorted member folds) and
    assignments are bit-reproducible in DuckDB — and because PQ's
    arithmetic is pure +/* (no ``ln``), the gate hashes actual SCORE
    doubles, not just ranks (plans/queries.py ``ann_ivfpq_topk``).

    Citation for parity bookkeeping: the reference engine has no
    vector-search tier at all (SURVEY.md §2) — this extends the
    beyond-parity ANN family (exact / LSH / IVF-flat) with the
    PQ-compressed rung.
    """
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        release_checkpoint,
        tracked_local_checkpoint,
    )
    from hpc_hd_textreuse_etl_spark.functions.hashing import portable_hash64

    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    d_sub = dim // m
    vecs = corpus.select(
        F.col(id_col).alias("vid"), _normalize(F.col(vec_col)).alias("vn")
    )
    subs = vecs.select(
        "vid",
        F.posexplode(
            F.array(*[F.slice("vn", j * d_sub + 1, d_sub) for j in range(m)])
        ).alias("j", "s"),
    )
    if hash_family == "portable":
        h = portable_hash64(
            F.concat(F.col("vid").cast("string"), F.lit(f"#pq{seed}"))
        )
    else:
        h = F.xxhash64(F.col("vid"), F.lit(seed), F.lit("pq"))
    init_ids = (
        vecs.withColumn("h", h)
        .orderBy("h")
        .limit(ks)
        .select(
            # over <= ks seed rows (post-limit) — benign single-
            # partition trip (SCALE.md "Unpartitioned windows")
            F.row_number().over(Window.orderBy("h")).alias("code"),
            "vid",
        )
    )
    codebooks = subs.join(init_ids, "vid").select(
        "j", "code", F.col("s").alias("centroid")
    )

    def assign(cb: DataFrame) -> DataFrame:
        """L2-nearest code per (vector, subspace); ties → smallest code.
        Struct-max hash aggregation (map-side combinable), never a
        window over the crossed candidates."""
        l2 = F.aggregate(
            F.zip_with("s", "centroid", lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        scored = subs.join(F.broadcast(cb), "j").withColumn("d", l2)
        return (
            scored.groupBy("vid", "j")
            .agg(
                F.max(
                    F.struct((-F.col("d")).alias("nd"), (-F.col("code")).alias("nc"))
                ).alias("b")
            )
            .select("vid", "j", (-F.col("b.nc")).cast("int").alias("code"))
        )

    def means(assigned: DataFrame) -> DataFrame:
        per_pos = assigned.join(subs, ["vid", "j"]).select(
            "j", "code", F.posexplode("s").alias("pos", "x")
        )
        if hash_family == "portable":
            cell_pos = (
                per_pos.groupBy("j", "code", "pos")
                .agg(F.array_sort(F.collect_list("x")).alias("xs"))
                .select(
                    "j", "code", "pos",
                    (
                        F.aggregate("xs", F.lit(0.0), lambda a, x: a + x)
                        / F.size("xs")
                    ).alias("c"),
                )
            )
        else:
            cell_pos = per_pos.groupBy("j", "code", "pos").agg(
                F.avg("x").alias("c")
            )
        return (
            cell_pos.groupBy("j", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select(
                "j", "code",
                F.transform(F.col("pc"), lambda s: s.getField("c")).alias(
                    "centroid"
                ),
            )
        )

    prev = None
    for _ in range(pq_iters):
        nxt = means(assign(codebooks))
        if use_checkpoints:
            # same per-round pin/release hygiene as ivf_index: each
            # round's table is m*ks rows but its lazy plan nests the
            # whole previous round
            nxt = tracked_local_checkpoint(nxt)
            if prev is not None:
                release_checkpoint(prev)
        codebooks, prev = nxt, nxt
    codes = assign(codebooks).withColumnRenamed("vid", id_col)
    return codebooks, codes


def pq_encode_arrays(codes: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Long-form ``(id, j, code)`` → storage-form ``(id, codes
    array<int>)`` in subspace order — the m-byte-per-vector layout a
    100 TB code table persists (one doc-keyed sorted fold, the same
    reassembly shape as dedup_repeated_lines)."""
    return (
        codes.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("j", "code"))).alias("jc"))
        .select(
            id_col,
            F.transform(F.col("jc"), lambda s: s.getField("code")).alias("codes"),
        )
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    m: int = 8,
    ks: int = 16,
    pq_iters: int = 1,
    seed: int = 42,
    dim: int = 64,
    hash_family: str = "xxhash64",
    use_checkpoints: bool = True,
    index: tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse IVF cells bound the candidate
    set (``n_probe`` probed cells per query), PQ codes + ADC score the
    candidates without ever touching their float vectors.

    ``(query_id, neighbor_id, adc, rank)`` — ``adc`` is the asymmetric
    distance computation estimate of the cosine on L2-normalized
    vectors: ``Σ_j <q_j, centroid[j, code_j(x)]>``, i.e. the dot of the
    normalized query against the candidate's RECONSTRUCTION. Per query
    the scan cost is a lookup-table build over ``m·ks`` centroid dots
    plus one m-term sum per candidate (the table is a broadcast join —
    the candidate's floats never load). The per-candidate fold runs in
    fixed subspace order (sorted fold over ``j``), so the adc doubles
    are bit-reproducible across engines — unlike BM25/DSIR there is no
    ``ln`` anywhere, which is why the contract query hashes the score
    VALUES, not just ranks. Recall vs exact top-k is gated by the
    ``ann_ivfpq_recall`` contract query (the ``ann_lsh_recall``
    pattern).

    Simplification vs Jégou et al.'s IVFADC: codes quantize the raw
    normalized vector, not the residual ``x − coarse_centroid`` —
    residual encoding needs a per-cell LUT (m·ks dots per (query,
    probed cell) instead of per query), which buys accuracy at 8×
    LUT cost here; the flat-encoding variant is the standard
    first rung (it is what FAISS calls ``IVFx,PQy`` without ``+R``).

    ``index=(centroids, assignments, codebooks, codes)`` skips training
    and scores against a pre-trained index — the train-once /
    score-many-ingests contract; persist and reload the four frames via
    functions/model_store.py (``save_model`` / ``load_model``). When
    ``index`` is given the training knobs (n_cells, lloyd_iters, m, ks,
    pq_iters, hash_family) are ignored except ``dim``/``m`` for the
    query-side subspace split — they must match the values the index
    was trained with (model_store's params check enforces this).
    """
    if dim % m != 0:
        # fail before any work — pq_train would raise the same error,
        # but only after the (expensive) ivf_index call already ran
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    if index is not None:
        # a pre-trained index — e.g. reloaded through
        # functions/model_store.py — so one training run scores many
        # query batches / ingests across sessions
        centroids, assignments, codebooks, codes = index
    else:
        centroids, assignments = ivf_index(
            corpus, id_col, vec_col, n_cells, lloyd_iters, seed,
            hash_family=hash_family, use_checkpoints=use_checkpoints,
        )
        codebooks, codes = pq_train(
            corpus, id_col, vec_col, m, ks, pq_iters, seed, dim,
            hash_family, use_checkpoints,
        )
    d_sub = dim // m
    qn = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qvec"),
        _normalize(F.col(vec_col)).alias("qn"),
    )
    q_subs = qn.select(
        "query_id",
        F.posexplode(
            F.array(*[F.slice("qn", j * d_sub + 1, d_sub) for j in range(m)])
        ).alias("j", "qs"),
    )
    lut = q_subs.join(F.broadcast(codebooks), "j").select(
        "query_id", "j", "code",
        F.aggregate(
            F.zip_with("qs", "centroid", lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("lt"),
    )
    # probe on the RAW double query against the coarse centroids —
    # the exact arithmetic ivf_topk uses, so the probe CTE is the SAME
    # computation in both the IVF-flat and IVF-PQ oracles
    probes = (
        qn.crossJoin(F.broadcast(centroids))
        .withColumn("sim", cosine(F.col("qvec"), F.col("centroid")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("sim"), F.asc("cell_id")
                )
            ),
        )
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell_id")
    )
    cands = (
        probes.join(
            assignments.withColumnRenamed(id_col, "neighbor_id"), "cell_id"
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    adc = (
        cands.join(
            codes.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id"
        )
        .join(lut, ["query_id", "j", "code"])
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("j", "lt"))),
                F.lit(0.0),
                lambda acc, s: acc + s.getField("lt"),
            ).alias("adc")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    return adc.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
