"""Scale soak: sf>=1-equivalent synthetic runs for the shuffle-heavy
operator families, recording wall time AND shuffle bytes so SCALE.md's
100x argument has measured local evidence per family (not just plan
audits). Inputs are synthesized with pure Catalyst expressions from
``spark.range`` — no testdata dependency, any size on demand.

Run:  python examples/soak.py [scale_multiplier]
Emits one JSON line per family: {family, rows, seconds, shuffle_read_mb,
shuffle_write_mb}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.session import get_spark


def _stage_totals(spark) -> tuple[int, int]:
    """Cumulative (shuffle_read_bytes, shuffle_write_bytes) across all
    completed stages, via the local UI REST API."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    read = sum(s.get("shuffleReadBytes", 0) for s in stages)
    write = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return read, write


def _wanted(family: str) -> bool:
    """Family filter: SPARK_GRAFT_SOAK_FAMILIES=cms,cdc runs only those."""
    sel = os.environ.get("SPARK_GRAFT_SOAK_FAMILIES", "")
    return not sel or family in {s.strip() for s in sel.split(",")}


def measured(spark, family: str, rows: int, fn) -> None:
    if not _wanted(family):
        return
    r0, w0 = _stage_totals(spark)
    t0 = time.perf_counter()
    out_rows = fn()
    secs = time.perf_counter() - t0
    r1, w1 = _stage_totals(spark)
    print(json.dumps({
        "family": family,
        "input_rows": rows,
        "output_rows": out_rows,
        "seconds": round(secs, 2),
        "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
    }), flush=True)


def synth_edges(spark, n: int):
    """Pair-span edges shaped like the coverages input: ~n rows over
    n/50 trs1 docs x 20 trs2 docs, window-bounded spans."""
    return spark.range(n).select(
        (F.col("id") % (n // 50)).alias("trs1_id"),
        (F.col("id") % 20).alias("trs2_id"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000))).alias("s1"),
        (F.pmod(F.xxhash64("id"), F.lit(100_000))
         + 50 + F.col("id") % 200).alias("e1"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))).alias("s2"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))
         + 30 + F.col("id") % 150).alias("e2"),
    )


def synth_docs(spark, n: int):
    """n documents of ~40 pseudo-random tokens in near-dup families of
    ~5 (36 tokens from a shared base doc + 4 unique) — so the banding
    join and verify stages carry representative candidate volume."""
    base = f"(id % {max(n // 5, 1)})"
    tok = (
        f"conv(lpad(hex(pmod(xxhash64(if(i <= 36, {base} * 41, id * 41) + i, 7),"
        " 50000)), 4, '0'), 16, 36)"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, 40), i -> {tok}))"
        ).alias("text"),
    )


def main() -> None:
    mult = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="soak",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # UI on: the REST stage API is where shuffle bytes come from
        extra_conf={"spark.driver.memory": "24g", "spark.ui.enabled": "true"},
    )

    # Islands / coverages — sf2-equivalent edge volume (events sf1 ~ 1M)
    from hpc_hd_textreuse_etl_spark.functions.intervals import merge_intervals

    n_edges = int(2_000_000 * mult)
    edges = synth_edges(spark, n_edges)

    def run_islands():
        isl = merge_intervals(edges, ["trs1_id", "trs2_id"], "s1", "e1",
                              adjacency_gap=1)
        return (
            isl.groupBy("trs1_id", "trs2_id")
            .agg(F.sum(F.col("island_end") - F.col("island_start"))
                 .alias("len"), F.count(F.lit(1)).alias("n"))
            .count()
        )

    measured(spark, "islands_coverages", n_edges, run_islands)

    # MinHash + LSH banding — sf1-equivalent docs (documents sf1 ~ 50k)
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        minhash_near_duplicates,
        simhash_near_duplicates,
    )

    n_docs = int(50_000 * mult)
    docs = synth_docs(spark, n_docs)
    docs.cache().count()  # isolate synthesis from the measured op

    measured(
        spark, "minhash_lsh", n_docs,
        lambda: minhash_near_duplicates(
            docs, "doc_id", "text", num_hashes=32, num_bands=8, threshold=0.7
        ).count(),
    )
    measured(
        spark, "simhash_banded", n_docs,
        lambda: simhash_near_duplicates(
            docs, "doc_id", "text", max_hamming=8
        ).count(),
    )

    # Defrag range-join — 1M pieces over 20k documents, window-bounded
    from hpc_hd_textreuse_etl_spark.operators.defrag import piece_id_mappings

    n_pieces = int(1_000_000 * mult)
    pieces = spark.range(n_pieces).select(
        F.col("id").alias("piece_id"),
        (F.col("id") % (max(n_pieces // 50, 1))).alias("trs_id"),
        (F.pmod(F.xxhash64("id"), F.lit(5000))).alias("trs_start"),
        (F.pmod(F.xxhash64("id"), F.lit(5000))
         + 20 + F.col("id") % 120).alias("trs_end"),
    )
    pieces.cache().count()
    measured(
        spark, "defrag_range_join", n_pieces,
        lambda: piece_id_mappings(pieces).count(),
    )

    # Connected components — per-bucket chains: long paths, the
    # worst case for label flooding, O(log n) rounds for star-contraction
    from hpc_hd_textreuse_etl_spark.operators.graph import connected_components
    from pyspark.sql import Window

    n_nodes = int(200_000 * mult)
    w = Window.partitionBy("b").orderBy("id")
    chain = (
        spark.range(n_nodes)
        .withColumn("b", F.col("id") % 500)
        .select(
            F.col("id").alias("src"),
            F.lead("id").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    chain.cache().count()
    measured(
        spark, "connected_components", n_nodes,
        lambda: connected_components(chain).count(),
    )

    # Fuzzy join — 200k entity strings, block_cols as the scale contract
    # demands (length-band alone over same-length corpora is quadratic)
    from hpc_hd_textreuse_etl_spark.operators.fuzzy import fuzzy_self_join

    n_names = int(200_000 * mult)
    names = spark.range(n_names).select(
        F.col("id").alias("nid"),
        (F.col("id") % 5000).alias("blk"),
        F.concat(
            F.lit("entity-"),
            (F.pmod(F.xxhash64("id"), F.lit(40_000))).cast("string"),
            F.lit("-"),
            (F.col("id") % 97).cast("string"),
        ).alias("name"),
    )
    names.cache().count()
    measured(
        spark, "fuzzy_join_blocked", n_names,
        lambda: fuzzy_self_join(
            names, "nid", "name", max_dist=2, block_cols=["blk"]
        ).count(),
    )

    # Count-Min sketch — 20M skewed events into a 4x65536 grid
    from hpc_hd_textreuse_etl_spark.operators.sketches import cms_sketch

    n_ev = int(20_000_000 * mult)
    ev = spark.range(n_ev).select(
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) % (1 + F.col("id") % 997))
        .alias("item")
    )
    measured(
        spark, "cms_sketch", n_ev,
        lambda: cms_sketch(ev, "item", width=65536, depth=4).count(),
    )

    # CDC latest-by-key — 20M-change log over 2M keys: the map-side
    # WindowGroupLimit prune is what bounds the shuffle
    from hpc_hd_textreuse_etl_spark.operators.cdc import latest_by_key

    n_chg = int(20_000_000 * mult)
    chg = spark.range(n_chg).select(
        (F.col("id") % 2_000_000).alias("k"),
        F.col("id").alias("ver"),
        F.xxhash64("id").alias("payload"),
    )
    measured(
        spark, "cdc_latest_by_key", n_chg,
        lambda: latest_by_key(chg, ["k"], ["ver"]).count(),
    )

    # Quantile sketch — 20M values, 1% deterministic sample, p50/p99
    from hpc_hd_textreuse_etl_spark.operators.sketches import (
        quantile_sketch,
        quantiles_from_sketch,
    )

    n_val = int(20_000_000 * mult)
    vals = spark.range(n_val).select(
        F.col("id").alias("rid"),
        (F.col("id") % 37).cast("string").alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(10_000_000)) / 100.0).alias("v"),
    )

    def run_quantiles():
        sk = quantile_sketch(vals, ["g"], "v", ["rid"], fraction=0.01)
        return quantiles_from_sketch(
            sk, ["g"], "v", qs=(0.5, 0.99), tiebreak_cols=("rid",)
        ).count()

    measured(spark, "quantile_sketch", n_val, run_quantiles)

    # Integer PageRank — 1M-edge scale-free-ish directed graph, 3 rounds
    from hpc_hd_textreuse_etl_spark.operators.graph import pagerank_scaled

    n_pr_edges = int(1_000_000 * mult)
    pr_edges = spark.range(n_pr_edges).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("src"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(100_000)) % 1000).alias("dst"),
    )
    pr_edges.cache().count()
    measured(
        spark, "pagerank_scaled", n_pr_edges,
        lambda: pagerank_scaled(pr_edges, iterations=3).count(),
    )

    # Weighted SSSP — same 1M-edge graph + integer weights, 3 rounds;
    # frontier relaxation keeps per-round shuffle ∝ improved nodes
    from hpc_hd_textreuse_etl_spark.operators.graph import sssp_weighted

    w_edges = pr_edges.withColumn(
        "weight", 1 + F.pmod(F.xxhash64("src", "dst"), F.lit(100))
    )
    w_edges.cache().count()
    src_df = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    measured(
        spark, "sssp_weighted", n_pr_edges,
        lambda: sssp_weighted(
            w_edges, src_df, rounds=3, directed=True
        ).count(),
    )

    # Funnel automaton — 20M events / 2M users: ONE user-key shuffle,
    # the sorted fold runs inside the agg stage
    from hpc_hd_textreuse_etl_spark.operators.funnel import funnel

    n_fev = int(20_000_000 * mult)
    fev = spark.range(n_fev).select(
        (F.col("id") % 2_000_000).alias("user_id"),
        F.timestamp_micros(
            F.pmod(F.xxhash64("id"), F.lit(30 * 86_400_000_000))
        ).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"),
                    F.lit("other")),
            (F.pmod(F.xxhash64(F.col("id") + 7), F.lit(4)) + 1).cast("int"),
        ).alias("event_type"),
    )
    measured(
        spark, "funnel_automaton", n_fev,
        lambda: funnel(
            fev, "user_id", "ts", "event_type",
            ("view", "click", "purchase"), within_seconds=86_400,
        ).count(),
    )

    # Chunking — 1M docs x ~200 tokens: zero-shuffle Generate; the
    # measurement demonstrates the stage is scan/compute-bound
    from hpc_hd_textreuse_etl_spark.operators.chunking import chunk_documents

    n_cdocs = int(1_000_000 * mult)
    cdocs = spark.range(n_cdocs).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1, 200),"
            " i -> conv(lpad(hex(pmod(xxhash64(id + i), 50000)), 4, '0'),"
            " 16, 36)))"
        ).alias("text"),
    )
    measured(
        spark, "chunk_documents", n_cdocs,
        lambda: chunk_documents(
            cdocs, "doc_id", "text", chunk_tokens=128, overlap_tokens=16
        ).count(),
    )

    # Prefix-filter set-similarity join — same near-dup corpus the
    # sketch dedups soak on, but EXACT: candidates only from rarity-
    # ordered prefixes
    from hpc_hd_textreuse_etl_spark.functions.text import tokens as _tokens
    from hpc_hd_textreuse_etl_spark.operators.setsim import (
        jaccard_threshold_pairs,
    )

    n_sdocs = int(50_000 * mult)
    sdocs = synth_docs(spark, n_sdocs)
    sdocs.cache().count()
    measured(
        spark, "setsim_prefix_filter", n_sdocs,
        lambda: jaccard_threshold_pairs(
            sdocs, "doc_id", _tokens(F.col("text")), threshold=0.7
        ).count(),
    )

    # BPE training — 200k docs x 40 symbols, 4 merge rounds: per round
    # ONE pair-count shuffle + map-only rewrite; symbols ~50k vocab
    from hpc_hd_textreuse_etl_spark.operators.bpe import bpe_train

    n_bdocs = int(200_000 * mult)
    bdocs = synth_docs(spark, n_bdocs)
    bdocs.cache().count()

    def run_bpe():
        merges, corpus = bpe_train(bdocs, "doc_id", "text", n_merges=4)
        return corpus.count() + merges.count()

    measured(spark, "bpe_train", n_bdocs, run_bpe)

    # k-core peel — the PageRank graph, 6 budget rounds of degree agg +
    # two semi-joins over a monotonically shrinking edge set
    from hpc_hd_textreuse_etl_spark.operators.graph import kcore

    measured(
        spark, "kcore_peel", n_pr_edges,
        lambda: kcore(pr_edges, "src", "dst", k=5, rounds=6).count(),
    )

    # Sliding-window distinct (WAU) — 20M events / 2M users / 30 days:
    # the dedup-first step collapses 20M rows to ~|users x days| before
    # the bounded x7 explode
    from hpc_hd_textreuse_etl_spark.operators.temporal import (
        decayed_sum,
        sliding_distinct_count,
    )

    measured(
        spark, "sliding_wau", n_fev,
        lambda: sliding_distinct_count(fev, "ts", "user_id", 7).count(),
    )

    # Decayed counters — same 20M events: one map-side-combined agg in
    # scaled-integer space
    measured(
        spark, "decayed_counters", n_fev,
        lambda: decayed_sum(
            fev.withColumn("v", (F.pmod(F.xxhash64("user_id"), F.lit(10_000))
                                 / 100.0)),
            ["user_id"], "v", "ts",
            as_of="1970-02-01 00:00:00", half_life="7 days",
        ).count(),
    )

    # Association rules — 10M basket items over 1M baskets x ~200 items
    # universe: pair fan-out bounded by per-basket size (~10)
    from hpc_hd_textreuse_etl_spark.operators.basket import association_rules

    n_bitems = int(10_000_000 * mult)
    bitems = spark.range(n_bitems).select(
        (F.col("id") % 1_000_000).alias("basket"),
        F.pmod(F.xxhash64("id"), F.lit(200)).alias("item"),
    )
    measured(
        spark, "basket_rules", n_bitems,
        lambda: association_rules(bitems, "basket", "item",
                                  min_pair_support=100).count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
