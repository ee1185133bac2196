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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.dedup import cosine


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    ``(query_id, neighbor_id, cosine, rank)``; self-matches excluded.
    The small side is broadcast so the big side streams without a
    shuffle; ranking shuffles only (query_id, neighbor, score) triples.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    if broadcast_queries:
        q = F.broadcast(q)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(q, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


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
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing an LSH bucket in
    ≥1 of ``num_tables`` tables; exact cosine rank within candidates.

    Recall grows with num_tables; cost is num_tables equi-joins on
    (table, bucket) — each a bounded shuffle, never a cross join."""
    def with_buckets(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(vec_col).alias(f"{side}_vec"),
            F.posexplode(
                F.array(
                    *[
                        hyperplane_bucket(vec_col, num_planes, seed + t, dim)
                        for t in range(num_tables)
                    ]
                )
            ).alias("table", "bucket"),
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
        "cosine", cosine(F.col("query_vec"), F.col("neighbor_vec"))
    ).select("query_id", "neighbor_id", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
