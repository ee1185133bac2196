"""Chinese Whispers label propagation over a piece graph.

Re-implementation of the reference's iterative clustering
(``etl_textreuse/assets/chinese_label_propagation.py:32-200``) as a
self-contained operator. Same algorithm:

- state per vertex: ``(piece_id, cluster_id, cluster_counts: map<long,long>,
  active: bool)``; initially each vertex is its own cluster and sees one
  vote per neighbor;
- each iteration, active vertices pick the arg-max cluster from their
  vote map with uniform tie-breaking (reservoir trick: accept a tied key
  with probability ``1/(ties_seen+1)``), apply the change with
  probability 0.9, then push ``-1``/``+1`` vote deltas to neighbors via
  the adjacency list, folded into per-vertex delta maps and merged with
  ``map_zip_with`` + ``map_filter`` (all Catalyst higher-order functions,
  no UDFs);
- convergence when no vertex is active, capped at ``max_iter``.

Deliberate improvements over the reference (its README documents the
loop as unstable, ``assets/README.md:250-251``):

- **Seeded determinism**: the reference uses ``rand()`` (re-evaluated,
  partition-dependent). We derive every coin from
  ``xxhash64(vertex, key, iteration, seed)`` and fold over
  ``array_sort(map_keys(...))``, so the run is reproducible bit-for-bit
  regardless of partitioning or retries.
- **Lineage truncation** via ``localCheckpoint`` per iteration (or
  parquet round-trip when a checkpoint dir is given — the durable,
  resumable option matching the reference's alternating
  ``clusters_counts_{0,1}`` tables).

Scale notes: the big-side join per iteration is against the adjacency
list; pass ``adjacency`` pre-bucketed by ``piece_id`` (see
:func:`write_bucketed_adjacency`) to make it shuffle-free, exactly like
the reference's 256-bucket layout. The delta fold is repartitioned on
``piece_id`` before grouping (the reference scales 256 → 4096 partitions
past 512M active vertices; we defer to AQE + an explicit knob).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

_COIN = "(pmod(xxhash64({args}), 1000000000) / 1000000000.0)"


def _coin(*args: str) -> str:
    return _COIN.format(args=", ".join(args))


def _coin_portable(*args: str) -> str:
    """The same uniform coin over the md5-based portable 60-bit hash
    (functions/hashing.py) of the '|'-joined string renderings — DuckDB
    computes the identical value as
    ``((('0x' || substr(md5(a || '|' || b ...), 1, 15))::BIGINT
    % 1000000000) / 1000000000.0)``, which is what lets a
    bounded-iteration CW run hash-match a SQL oracle
    (plans/queries.py ``chinese_whispers_portable``). xxhash64 stays the
    production family: one JVM intrinsic vs an md5 + string round-trip
    per coin."""
    joined = ", ".join(f"CAST({a} AS STRING)" for a in args)
    return (
        "(pmod(CAST(conv(substr(md5(concat_ws('|', "
        f"{joined}"
        ")), 1, 15), 16, 10) AS BIGINT), 1000000000) / 1000000000.0)"
    )


def symmetrize_edges(edges: DataFrame, src: str = "piece1_id", dst: str = "piece2_id") -> DataFrame:
    """Undirected edge list → both directions (reference ``:36-41``)."""
    a = edges.select(F.col(src).alias("piece_id"), F.col(dst).alias("other_piece_id"))
    b = edges.select(F.col(dst).alias("piece_id"), F.col(src).alias("other_piece_id"))
    return a.unionAll(b)


def adjacency_list(edges: DataFrame, src: str = "piece1_id", dst: str = "piece2_id") -> DataFrame:
    """``(piece_id, other_piece_ids: array<long>)`` (reference ``:36-44``)."""
    return (
        symmetrize_edges(edges, src, dst)
        .groupBy("piece_id")
        .agg(F.collect_list("other_piece_id").alias("other_piece_ids"))
    )


def write_bucketed_adjacency(
    spark: SparkSession, adj: DataFrame, table: str = "adjacency_list",
    buckets: int = 256, path: str | None = None,
) -> DataFrame:
    """Persist the adjacency list bucketed+sorted by ``piece_id`` so every
    per-iteration join co-locates without a shuffle (reference ``:45-50``)."""
    writer = adj.write.bucketBy(buckets, "piece_id").sortBy("piece_id")
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table, mode="overwrite", format="parquet", compression="zstd")
    return spark.read.table(table)


def chinese_whispers(
    adj: DataFrame,
    max_iter: int = 100,
    seed: int = 42,
    update_prob: float = 0.9,
    repartition: int | None = None,
    checkpoint: str | None = None,
    resume: bool = False,
    verbose: bool = False,
    tie_freeze: int | None = 5,
    min_active: int | float = 0,
    materialize_adjacency: bool = True,
    hash_family: str = "xxhash64",
) -> tuple[DataFrame, int]:
    """Run the loop; returns ``(state, iterations)`` where state has
    ``(piece_id, cluster_id, cluster_counts, active, stale)``.

    ``adj`` must be an adjacency list (see :func:`adjacency_list`).

    ``resume=True`` with a durable ``checkpoint`` dir continues from the
    last completed iteration (fixing the reference's hard-coded
    ``iter=0`` + manual-resume procedure, chinese_label_propagation.py:77
    and assets/README.md:250-251). Coins are keyed on the absolute
    iteration number, so a resumed run follows the identical trajectory
    an uninterrupted run would have taken.

    ``tie_freeze`` (round-8 convergence fix): in the reference, a vertex
    whose arg-max is TIED stays active forever — on tie-rich graphs the
    loop never converges and ``max_iter`` full iterations are always
    paid (reference cap at chinese_label_propagation.py:105; measured in
    the round-7 composed pipeline as CW consuming ~47% of total wall).
    A tied vertex whose vote map has not changed for ``tie_freeze``
    consecutive iterations is FROZEN: with a static map, its remaining
    moves are a pure coin walk among equal-vote labels — zero
    information, unbounded churn (each flip re-activates neighbors,
    whose deltas can re-activate it, forever). Freezing keeps its
    current label; any later vote-map change (a neighbor genuinely
    moving) resets the staleness counter and re-activates it, so only
    provably-stagnant ties are cut. ``tie_freeze=None`` restores the
    reference's never-converge behavior. Determinism is unchanged: the
    trajectory is identical to the unfrozen run until the first freeze
    triggers, and the freeze rule itself is deterministic.

    ``min_active`` (activity floor, default 0 = exact convergence): stop
    once the active-vertex count is ≤ the floor (an absolute count, or a
    fraction of the vertex count when < 1). Mutually-adjacent tied
    GROUPS keep exchanging deltas (each flip resets neighbors'
    staleness), so tie-freeze turns their activity into geometric decay
    rather than an instant cut — measured ~0.9×/iteration on the
    composed-pipeline corpus — and the exact-zero tail can cost hundreds
    of iterations for a vanishing fraction of vertices. The floor is the
    principled terminator for that tail: deterministic (a pure function
    of the deterministic trajectory), and bounded — at most
    ``min_active`` vertices hold a label that one more coin flip might
    still have changed.

    ``hash_family``: ``"xxhash64"`` (default, production) derives coins
    from the JVM-side xxhash64; ``"portable"`` derives them from the
    md5-based cross-engine hash (functions/hashing.py) so a
    bounded-iteration run is reproducible bit-for-bit in DuckDB SQL —
    the family that puts CW under the full value-hash oracle gate
    (plans/queries.py ``chinese_whispers_portable``) instead of
    rows-only. The two families follow different (equally valid)
    trajectories; everything else about the loop is identical.
    """
    if hash_family not in ("xxhash64", "portable"):
        raise ValueError(f"unknown hash_family {hash_family!r}")
    coin = _coin if hash_family == "xxhash64" else _coin_portable
    # The tie-break threshold 1/(ties+1): with "portable" it must be a
    # DOUBLE division — Spark's bare `1.0/n` divides in decimal(13,12),
    # whose rounding disagrees with DuckDB's double `1.0/n` by one ulp
    # for some n (measured at n=1923), which would silently fork the
    # cross-engine trajectory. The xxhash64 family keeps the original
    # decimal form verbatim: its trajectories are golden-pinned
    # (plans/queries.py chinese_whispers_clusters) and have no oracle to
    # agree with.
    one = "1.0" if hash_family == "xxhash64" else "CAST(1.0 AS DOUBLE)"
    spark = adj.sparkSession
    if checkpoint is None:
        # Durable per-iteration round-trip is mandatory: an in-memory
        # localCheckpoint empirically fails to cut the *physical*
        # recomputation chain (iteration time grows ~2.5× per step), the
        # same instability that drove the reference to its alternating
        # saveAsTable checkpoints.
        import tempfile

        checkpoint = tempfile.mkdtemp(prefix="clp-checkpoint-")

    from hpc_hd_textreuse_etl_spark.catalog import path_exists

    if materialize_adjacency:
        # The per-iteration ``changed.join(adj)`` is a SEPARATE Spark
        # action each iteration, and Spark does not reuse shuffle output
        # across actions — a lazy adjacency plan (explode + groupBy +
        # collect_list over every edge) would be recomputed max_iter
        # times. One durable snapshot makes each iteration's join read a
        # plain parquet scan instead. Callers that pass an ALREADY
        # materialized adjacency — a bucketed table from
        # :func:`write_bucketed_adjacency` (whose bucket metadata a
        # parquet round-trip would destroy, reintroducing the join
        # shuffle) or a pre-persisted frame — should pass
        # ``materialize_adjacency=False``.
        adj_path = f"{checkpoint}/adjacency"
        if not (resume and path_exists(spark, adj_path)):
            adj.write.mode("overwrite").option("compression", "zstd").parquet(
                adj_path
            )
        adj = spark.read.parquet(adj_path)

    meta_path = f"{checkpoint}/clp_meta"
    it = 0
    if resume and path_exists(spark, meta_path):
        it = spark.read.parquet(meta_path).first()["iter"]
        state = _read_checkpoint(spark, checkpoint, it)
        active_count = state.filter("active").count()
        total_count = state.count()
    else:
        # Initial votes: one per neighbor occurrence. Parallel edges (a
        # pair surviving defrag in both directions) are summed into one
        # map entry — map_from_entries would reject the duplicate key.
        state = (
            adj.select("piece_id", F.explode("other_piece_ids").alias("o"))
            .groupBy("piece_id", "o")
            .agg(F.count(F.lit(1)).cast("long").alias("votes"))
            .groupBy("piece_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct(F.col("o"), F.col("votes")))
                ).alias("cluster_counts")
            )
            .withColumn("cluster_id", F.col("piece_id"))
            .withColumn("active", F.lit(True))
            .withColumn("stale", F.lit(0))
            .select("piece_id", "cluster_id", "cluster_counts", "active", "stale")
        )
        state, active_count, total_count = _truncate_lineage(
            spark, state, checkpoint, 0
        )
    floor = min_active
    if isinstance(min_active, float) and 0 < min_active < 1:
        floor = int(min_active * total_count)
    while active_count > floor and it < max_iter:
        # 1. arg-max vote with deterministic reservoir tie-breaking.
        # Fold over sorted keys so the outcome is partition-independent.
        # The tie-branch divisor is clamped with greatest(...,1): in any
        # consistent state the branch is only reachable on a vote tie
        # with same_count >= 1, but if vote bookkeeping ever desyncs
        # from the adjacency (seen in round 7's composed-pipeline lazy
        # plan, where a job-unstable upstream recomputed different
        # vertex ids per iteration — functions/ids.py zip_with_index,
        # since fixed), negative vote entries can tie with the initial
        # accumulator's same_count = -1 and the raw division throws
        # DIVIDE_BY_ZERO under ANSI. Total expressions keep a
        # bookkeeping anomaly diagnosable instead of fatal mid-fold.
        pick = f"""
        aggregate(
          array_sort(map_keys(cluster_counts)),
          (bigint(-1) as cluster_id, bigint(-1) as count, bigint(-1) as same_count),
          (acc, y) ->
            IF(acc.count <= cluster_counts[y],
              IF(acc.count < cluster_counts[y],
                (y as cluster_id, cluster_counts[y] as count, 1 as same_count),
                IF({coin("piece_id", "y", f"int({it})", f"int({seed})")} < {one}/greatest(acc.same_count + 1, 1),
                  (y as cluster_id, acc.count as count, acc.same_count + 1 as same_count),
                  (acc.cluster_id as cluster_id, acc.count as count, acc.same_count + 1 as same_count))),
              acc),
          acc -> (acc.cluster_id as cluster_id, acc.same_count > 1 as tied)
        )
        """
        gate = f"{coin('piece_id', f'int({it})', f'int({seed + 1})')} <= {update_prob}"
        updates = (
            state.filter(F.col("active"))
            .select("piece_id", F.col("cluster_id").alias("old_cluster_id"), "cluster_counts")
            .withColumn("picked", F.expr(pick))
            .select(
                "piece_id",
                "old_cluster_id",
                F.col("picked.cluster_id").alias("new_cluster_id"),
                F.col("picked.tied").alias("tied"),
            )
            .withColumn(
                "do_update",
                (F.col("old_cluster_id") != F.col("new_cluster_id")) & F.expr(gate),
            )
            .filter(F.col("tied") | F.col("do_update"))
            .persist()
        )

        # 2. push ±count deltas to all neighbors of changed vertices
        changed = updates.filter(F.col("do_update")).join(adj, "piece_id")
        exploded = changed.select(
            F.explode("other_piece_ids").alias("piece_id"),
            "old_cluster_id",
            "new_cluster_id",
        )
        if repartition:
            exploded = exploded.repartition(repartition, "piece_id")
        deltas = (
            exploded.groupBy("piece_id", "old_cluster_id", "new_cluster_id")
            .count()
            .groupBy("piece_id")
            .agg(
                F.expr(
                    """
            aggregate(
              collect_list(struct(old_cluster_id, new_cluster_id, count)),
              cast(map() AS MAP<BIGINT, BIGINT>),
              (acc, u) -> map_concat(
                map(u.old_cluster_id, coalesce(acc[u.old_cluster_id], 0) - u.count,
                    u.new_cluster_id, coalesce(acc[u.new_cluster_id], 0) + u.count),
                map_filter(acc, (k, v) -> k != u.old_cluster_id and k != u.new_cluster_id))
            )
            """
                ).alias("count_updates")
            )
        )

        # 3. merge deltas + recompute active. The two per-vertex event
        # streams (an active vertex's own pick, the deltas its neighbors
        # pushed) are both active-proportional while the state is
        # corpus-proportional — pre-merging them costs one SMALL outer
        # join but halves the number of big-side joins per iteration
        # (one shuffle/broadcast of the full state instead of two).
        events = updates.select(
            "piece_id", "do_update", "new_cluster_id", "tied"
        ).join(deltas, "piece_id", "full")
        state = (
            state.join(events, "piece_id", "left")
            .withColumn(
                "cluster_id",
                F.when(F.col("do_update") == True, F.col("new_cluster_id")).otherwise(  # noqa: E712
                    F.col("cluster_id")
                ),
            )
            .withColumn(
                "cluster_counts",
                F.expr(
                    """
          IF(isnull(count_updates), cluster_counts,
            map_filter(
              map_zip_with(cluster_counts, count_updates, (k, v1, v2) -> coalesce(v1, 0) + coalesce(v2, 0)),
              (k, v) -> v != 0))
          """
                ),
            )
            .withColumn(
                "stale",
                # consecutive iterations with NO vote-map change; any
                # arriving delta resets it (and re-activates, below)
                F.when(F.col("count_updates").isNotNull(), F.lit(0)).otherwise(
                    F.col("stale") + 1
                ),
            )
            .withColumn(
                "active",
                (
                    F.coalesce(F.col("tied"), F.lit(False))
                    & (
                        F.lit(True)
                        if tie_freeze is None
                        else F.col("stale") < F.lit(tie_freeze)
                    )
                )
                | F.col("count_updates").isNotNull(),
            )
            .select("piece_id", "cluster_id", "cluster_counts", "active", "stale")
        )
        it += 1
        state, active_count, total_count = _truncate_lineage(
            spark, state, checkpoint, it
        )
        spark.createDataFrame([(it,)], "iter int").write.mode("overwrite").parquet(
            meta_path
        )
        updates.unpersist()
        if verbose:
            import time

            plan_len = len(state._jdf.queryExecution().optimizedPlan().toString())
            print(
                f"iter={it} active={active_count} plan_chars={plan_len} t={time.time():.1f}",
                flush=True,
            )
    return state, it


def clustered_pieces(state: DataFrame) -> DataFrame:
    """Final ``(piece_id, cluster_id)`` (reference:
    assets/downstream_clusters.py:13-33)."""
    return state.select("piece_id", "cluster_id")


def _truncate_lineage(
    spark: SparkSession, df: DataFrame, checkpoint: str, it: int
) -> tuple[DataFrame, int, int]:
    """Stop the iterative plan (and physical recomputation chain) from
    growing: parquet round-trip on alternating paths, the durable /
    resumable pattern of the reference (``:189-197``).

    Returns ``(reread_state, active_count, total_count)``. The counts
    ride along on the write job via ``observe`` — the loop's convergence
    check needs them every iteration, and a separate
    ``filter("active").count()`` would schedule one extra job per
    iteration re-reading the parquet just written.
    """
    path = f"{checkpoint}/clusters_counts_{it % 2}"
    obs = Observation()
    df = df.observe(
        obs,
        F.sum(F.col("active").cast("long")).alias("active"),
        F.count(F.lit(1)).alias("rows"),
    )
    df.write.mode("overwrite").option("compression", "zstd").partitionBy(
        "active"
    ).parquet(path)
    got = obs.get
    return (
        _read_checkpoint(spark, checkpoint, it),
        int(got["active"] or 0),
        int(got["rows"]),
    )


def _read_checkpoint(spark: SparkSession, checkpoint: str, it: int) -> DataFrame:
    # partition columns come back as strings; restore the boolean
    df = spark.read.parquet(f"{checkpoint}/clusters_counts_{it % 2}").withColumn(
        "active", F.col("active") == "true"
    )
    if "stale" not in df.columns:
        # resume from a pre-round-8 checkpoint (no staleness column):
        # start counting from zero — conservative (delays freezes, never
        # forces one early)
        df = df.withColumn("stale", F.lit(0))
    return df
