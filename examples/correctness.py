"""Full-registry correctness self-audit → CORRECTNESS_SELF.json.

Runs EVERY contract query in the registry through the exact driver gate
(Spark result vs DuckDB oracle at sf0.01: row count, sorted-column
schema, and value equality), so the complete 143-row verdict is a
committed artifact rather than whatever sample the external driver drew
this round. Queries without an oracle (randomized algorithms) get the
driver's weaker rows-only record, same as the external gate.

Usage:
    python examples/correctness.py [--sf-dir /root/testdata/sf0.01] \
        [--out CORRECTNESS_SELF.json] [--only name1,name2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(__file__)), "CORRECTNESS_SELF.json"),
    )
    ap.add_argument("--only", default="", help="comma-separated query subset")
    ap.add_argument(
        "--master",
        default="",
        help="Spark master override, e.g. local-cluster[2,8,4096] to gate "
             "the registry across REAL executor process boundaries "
             "(serialized tasks, per-executor broadcast, no shared JVM)",
    )
    args = ap.parse_args()

    from hpc_hd_textreuse_etl_spark.plans.queries import QUERIES
    from hpc_hd_textreuse_etl_spark.session import get_spark
    from tests.oracle_utils import duckdb_connection, normalized_rows

    spark = get_spark(
        master=args.master
        or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "16")),
    )
    con = duckdb_connection(args.sf_dir)
    names = sorted(QUERIES)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    results: dict[str, dict] = {}
    t0 = time.time()
    for i, name in enumerate(names, 1):
        spec = QUERIES[name]
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            df = spec.builder(spark, args.sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(srows)
            if spec.oracle is None:
                rec["rows_match"] = len(srows) >= 0
                rec["note"] = "no_oracle"
            else:
                res = con.execute(spec.oracle)
                dcols = [d[0] for d in res.description]
                drows = [tuple(r) for r in res.fetchall()]
                rec["oracle_rows"] = len(drows)
                scols_s, srows_s = normalized_rows(scols, srows)
                dcols_s, drows_s = normalized_rows(dcols, drows)
                rec["rows_match"] = len(srows_s) == len(drows_s)
                rec["schema_match"] = scols_s == dcols_s
                h = lambda rows: hashlib.sha256(  # noqa: E731
                    "\n".join(repr(r) for r in rows).encode()
                ).hexdigest()
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"] and h(srows_s) == h(drows_s)
                )
        except Exception as exc:  # record, don't abort the audit
            rec["err"] = f"{type(exc).__name__}: {exc}"[:500]
        results[name] = rec
        status = (
            "ERR" if rec["err"]
            else "no_oracle" if rec.get("note")
            else ("MATCH" if rec["hash_match"] else "MISMATCH")
        )
        print(f"[{i}/{len(names)}] {name}: {status} ({rec['spark_rows']} rows)", flush=True)

    oracle_names = [n for n in names if QUERIES[n].oracle is not None]
    summary = {
        "sf_dir": args.sf_dir,
        "total_queries": len(names),
        "with_oracle": len(oracle_names),
        "hash_match": sum(1 for n in oracle_names if results[n]["hash_match"]),
        "rows_only_ok": sum(
            1 for n in names
            if QUERIES[n].oracle is None and results[n]["rows_match"] and not results[n]["err"]
        ),
        "errors": sorted(n for n in names if results[n]["err"]),
        "mismatches": sorted(
            n for n in oracle_names if not results[n]["hash_match"] and not results[n]["err"]
        ),
        "elapsed_sec": round(time.time() - t0, 1),
    }
    payload = {"_summary": summary, **results}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(summary))
    failed = summary["mismatches"] or summary["errors"]
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
