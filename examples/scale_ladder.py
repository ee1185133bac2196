"""Scale-factor ladder: measure headline-query growth sf0.1 → sf1.

``--generate`` builds an sf1-equivalent synthetic dataset from the
driver's sf0.1 parquet by replicating every fact table N× (default 10)
with disjoint surrogate-key ranges per replica — joins stay consistent
within a replica, group cardinalities scale, and the replication runs
as ONE distributed pass per table (``crossJoin(spark.range(N))`` +
key-offset arithmetic; no driver loops, no collected data).

Two scale-semantics details, deliberately handled:

- document TEXT is re-keyed per replica with a vowel permutation
  (``F.translate``): verbatim copies would make every cross-replica
  pair a near-duplicate, growing dedup FAMILIES (and their quadratic
  pair outputs) 10×, which measures an artifact, not scaling. With the
  permutation, near-dup families keep their original size and family
  COUNT scales 10× — the actual sf1 shape.
- EMBEDDINGS get deterministic per-replica sign flips
  (xxhash64-derived): identical vectors across replicas would again
  create cross-replica near-dup pairs; random sign patterns make
  cross-replica cosine ≈ 0 while preserving norms.

``--run`` executes the bench-tagged registry queries against both
directories in one session, recording wall seconds and per-query
shuffle read/write bytes (UI REST stage totals), and writes
``SCALE_LADDER.json`` with a growth ratio per query (data grows 10× —
a plan that holds at scale shows ratio ≈ 10× or less on wall time;
super-linear ratios demand an explanation or a fix, see SCALE.md).

Usage:
    python examples/scale_ladder.py --generate          # build sf1 dir
    python examples/scale_ladder.py --run               # measure both
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, "scale_data", "sf1")
SF10 = os.path.join(REPO, "scale_data", "sf10")

#: the deep rung runs only the shuffle/compute-heavy queries whose
#: sf0.1 wall is NOT overhead-dominated — a third decade of data for
#: the exponents that matter.
DEEP_QUERIES = (
    "pricing_summary", "defrag_piece_mappings", "pair_coverage",
    "minhash_near_duplicates", "interval_coverage", "user_sessions",
    "purchase_funnel", "cdc_latest_events", "decayed_customer_value",
    "orders_table_diff",
)

#: key columns per table, grouped by the surrogate-key DOMAIN they
#: reference — every column in a domain shifts by the same offset so
#: foreign keys stay consistent within a replica.
KEY_DOMAINS: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

DIM_TABLES = ("region", "nation")
FACT_TABLES = (
    "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings",
)

#: character remap source for per-replica text perturbation: three
#: independently-rotated letter groups give 5×6×6 = 180 distinct
#: permutations (identity at r=0), so up to 180 replicas never share a
#: mapping — sharing one would make cross-replica document pairs
#: near-duplicates and quadratically inflate dedup outputs.
TRANS_SRC = "aeiou" + "shrdlu" + "tnclmw"


def _trans_dst(r: int) -> str:
    def rot(s: str, k: int) -> str:
        k %= len(s)
        return s[k:] + s[:k]

    return (
        rot("aeiou", r % 5)
        + rot("shrdlu", (r // 5) % 6)
        + rot("tnclmw", (r // 30) % 6)
    )


def generate(spark, out_dir: str, replicas: int) -> None:
    from hpc_hd_textreuse_etl_spark.catalog import load_table

    os.makedirs(out_dir, exist_ok=True)
    # one offset per key domain: max over every column in the domain + 1
    offsets: dict[str, int] = {}
    loaded = {t: load_table(spark, SF01, t, register_view=False) for t in FACT_TABLES}
    for domain, cols in KEY_DOMAINS.items():
        offsets[domain] = 1 + max(
            loaded[t].agg(F.max(c)).first()[0] for t, c in cols
        )

    for t in DIM_TABLES:
        load_table(spark, SF01, t, register_view=False).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{t}.parquet"))

    col_domain = {
        (t, c): domain for domain, cols in KEY_DOMAINS.items() for t, c in cols
    }
    for t in FACT_TABLES:
        df = loaded[t].crossJoin(
            spark.range(replicas).select(F.col("id").alias("__r"))
        )
        for c in df.columns:
            if (t, c) in col_domain:
                df = df.withColumn(
                    c, F.col(c) + F.col("__r") * F.lit(offsets[col_domain[(t, c)]])
                )
        if t == "documents":
            if replicas > 180:
                raise ValueError("text perturbation supports ≤ 180 replicas")
            trans = F.col("text")
            for r in range(1, replicas):
                trans = F.when(
                    F.col("__r") == r,
                    F.translate("text", TRANS_SRC, _trans_dst(r)),
                ).otherwise(trans)
            df = df.withColumn("text", trans).withColumn(
                "n_chars", F.length("text").cast("long")
            )
        if t == "embeddings":
            # per-replica deterministic sign flips: cross-replica cosine
            # collapses, norms are preserved
            df = df.withColumn(
                "embedding",
                F.when(F.col("__r") == 0, F.col("embedding")).otherwise(
                    F.expr(
                        "transform(embedding, (x, i) -> CASE WHEN"
                        " pmod(xxhash64(__r, i), 2) = 0 THEN x ELSE -x END)"
                    )
                ),
            )
        df.drop("__r").write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{t}.parquet")
        )
        print(f"generated {t} ×{replicas}", flush=True)


def _stage_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


#: ladder rungs: (label, dir, scale factor). sf0.01 is the driver's
#: small gate; sf1 is the generated 10× set. Three points let the
#: growth EXPONENT be fitted, not just one ratio read off.
RUNGS = (
    ("sf0.01", "/root/testdata/sf0.01", 0.01),
    ("sf0.1", SF01, 0.1),
    ("sf1", SF1, 1.0),
)


#: deep rungs: one more decade for the heavy queries (sf10 = 100×
#: replication — 60M lineitem / 10M events / 500k documents locally).
DEEP_RUNGS = (
    ("sf0.1", SF01, 0.1),
    ("sf1", SF1, 1.0),
    ("sf10", SF10, 10.0),
)


def run(spark, out_path: str, rungs=RUNGS, only=None) -> None:
    import math

    from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES

    names = [n for n, s in QUERIES.items() if s.bench]
    if only:
        names = [n for n in names if n in set(only)]
    results: dict[str, dict] = {}
    for sf_label, sf_dir, _sf in rungs:
        # warm the JVM/footers (excluded from timings)
        QUERIES[names[0]].builder(spark, sf_dir).count()
        for name in names:
            best, best_sh = float("inf"), (0, 0)
            rows = None
            for _ in range(int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))):
                r0, w0 = _stage_totals(spark)
                t0 = time.perf_counter()
                df = QUERIES[name].builder(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                secs = time.perf_counter() - t0
                r1, w1 = _stage_totals(spark)
                if secs < best:
                    best, best_sh = secs, (r1 - r0, w1 - w0)
            rec = results.setdefault(name, {})
            rec[sf_label] = {
                "sec": round(best, 3),
                "shuffle_read_mb": round(best_sh[0] / 1e6, 2),
                "shuffle_write_mb": round(best_sh[1] / 1e6, 2),
            }
            print(f"{sf_label} {name}: {best:.2f}s "
                  f"(shuffle {best_sh[1] / 1e6:.1f} MB)", flush=True)

    lo_label, hi_label = rungs[-2][0], rungs[-1][0]
    for name, rec in results.items():
        a, b = rec[lo_label], rec[hi_label]
        rec["wall_ratio"] = round(b["sec"] / max(a["sec"], 1e-9), 2)
        rec["shuffle_ratio"] = round(
            b["shuffle_write_mb"] / max(a["shuffle_write_mb"], 1e-6), 2
        ) if a["shuffle_write_mb"] > 0.01 else None
        # fitted growth exponent: least-squares slope of log(sec) vs
        # log(sf) over all rungs. Fixed per-query overhead deflates the
        # small-sf points, so the slope UNDER-states asymptotic growth
        # (it is a lower bound); the top-rung ratio is the conservative
        # upper read. Exponent ≈ 1 = linear; > 1 = super-linear.
        xs = [math.log10(sf) for _, _, sf in rungs]
        ys = [math.log10(max(rec[lbl]["sec"], 1e-3)) for lbl, _, _ in rungs]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        rec["wall_exponent"] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys))
            / sum((x - mx) ** 2 for x in xs),
            2,
        )
    payload = {
        "data_growth": 10.0,
        "rungs": [lbl for lbl, _, _ in rungs],
        "note": "wall_ratio is the top-rung step (10× data); "
                "wall_exponent is the log-log slope over all rungs; "
                "see SCALE.md for per-query readings",
        "queries": results,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({
        f"total_{lo_label}": round(sum(r[lo_label]["sec"] for r in results.values()), 2),
        f"total_{hi_label}": round(sum(r[hi_label]["sec"] for r in results.values()), 2),
        "max_ratio": max(r["wall_ratio"] for r in results.values()),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--generate", action="store_true")
    ap.add_argument("--run", action="store_true")
    ap.add_argument("--generate-deep", action="store_true",
                    help="build the 100× sf10 set")
    ap.add_argument("--deep", action="store_true",
                    help="run the heavy-query subset at sf0.1/1/10")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--out", default=os.path.join(REPO, "SCALE_LADDER.json"))
    ap.add_argument("--deep-out", default=os.path.join(REPO, "SCALE_DEEP.json"))
    args = ap.parse_args()

    from hpc_hd_textreuse_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale-ladder",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        # the UI REST API is the shuffle-bytes source (off by default)
        extra_conf={"spark.ui.enabled": "true", "spark.driver.memory": "24g"},
    )
    if args.generate:
        generate(spark, SF1, args.replicas)
    if args.generate_deep:
        generate(spark, SF10, 100)
    if args.run:
        run(spark, args.out)
    if args.deep:
        run(spark, args.deep_out, rungs=DEEP_RUNGS, only=DEEP_QUERIES)
    spark.stop()


if __name__ == "__main__":
    main()
