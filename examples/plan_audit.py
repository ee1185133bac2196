#!/usr/bin/env python
"""Per-query plan audit + optional noop-sink timing (guide §1).

For every bench-tagged query (or an explicit name list) build the
DataFrame at ``$SPARK_GRAFT_SF_DIR``, dump ``explain("formatted")`` to
``plans/r11/<name>_<tag>.txt``, and print a one-line plan-shape summary
(Exchange count, join strategies, Python-eval nodes, scan pushdown).
With ``--time`` also run the noop sink ``--repeats`` times per query
(min + stddev), with the job labelled in the UI.

Usage:
    python examples/plan_audit.py --tag before [--time] [--repeats 3] [names...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES  # noqa: E402
from hpc_hd_textreuse_etl_spark.session import get_spark  # noqa: E402

PLAN_MARKERS = (
    ("Exchange", r"\bExchange\b"),
    ("SortMergeJoin", r"\bSortMergeJoin\b"),
    ("BroadcastHashJoin", r"\bBroadcastHashJoin\b"),
    ("ShuffledHashJoin", r"\bShuffledHashJoin\b"),
    ("BroadcastNestedLoopJoin", r"\bBroadcastNestedLoopJoin\b"),
    ("CartesianProduct", r"\bCartesianProduct\b"),
    ("BatchEvalPython", r"\bBatchEvalPython\b"),
    ("ArrowEvalPython", r"\bArrowEvalPython\b"),
    ("FlatMapGroupsInPandas", r"\bFlatMapGroupsInPandas\b"),
    ("MapInArrow", r"\bMapInArrow\b"),
    ("Window", r"\bWindow\b"),
    ("Sort", r"\bSort\b"),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="query names (default: bench set)")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--time", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--outdir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="plan-audit", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    names = args.names or [n for n, s in QUERIES.items() if s.bench]
    os.makedirs(args.outdir, exist_ok=True)

    # warm JVM + footers once, off the clock
    QUERIES[names[0]].builder(spark, sf_dir).count()

    results: dict[str, dict] = {}
    for name in names:
        df = QUERIES[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        counts = {label: len(re.findall(rx, plan)) for label, rx in PLAN_MARKERS}
        summary = {k: v for k, v in counts.items() if v}
        row: dict = {"plan": summary}
        if args.time:
            samples = []
            for i in range(args.repeats):
                spark.sparkContext.setJobDescription(f"{name} [{args.tag} r{i}]")
                t0 = time.perf_counter()
                fresh = QUERIES[name].builder(spark, sf_dir)
                fresh.write.format("noop").mode("overwrite").save()
                samples.append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
            mean = sum(samples) / len(samples)
            row["min_s"] = round(min(samples), 4)
            row["stddev_s"] = round(
                math.sqrt(sum((s - mean) ** 2 for s in samples) / len(samples)), 4)
        results[name] = row
        print(json.dumps({name: row}), flush=True)

    if args.time:
        total = round(sum(r["min_s"] for r in results.values()), 4)
        print(json.dumps({"total_min_s": total, "sf_dir": sf_dir,
                          "loadavg": [round(v, 2) for v in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
