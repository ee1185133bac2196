#!/usr/bin/env python
"""Headline-query benchmark.

Runs the bench-tagged queries from the registry at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES  # noqa: E402
from hpc_hd_textreuse_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="bench",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    names = [n for n, s in QUERIES.items() if s.bench]

    # warm the JVM + parquet footers once (excluded from timings)
    QUERIES[names[0]].builder(spark, sf_dir).count()

    timings: dict[str, float] = {}
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            start = time.perf_counter()
            df = QUERIES[name].builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
