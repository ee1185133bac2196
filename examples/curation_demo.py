"""Training-corpus curation walkthrough — the composition
plans/curation.py ships, stage by stage, on the synthetic documents
table.

Run:  python examples/curation_demo.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import load_testdata
from hpc_hd_textreuse_etl_spark.operators.dedup import (
    minhash_near_duplicates,
    ngram_contamination,
    resolve_duplicates,
)
from hpc_hd_textreuse_etl_spark.plans.curation import (
    CurationConfig,
    curate,
    exact_dedup_keepers,
    quality_gate,
)
from hpc_hd_textreuse_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="curation-demo", master="local[8]",
                      shuffle_partitions=8)
    load_testdata(spark, sf_dir)
    docs = spark.table("documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    cfg = CurationConfig()

    n0 = corpus.count()
    q = quality_gate(corpus, "text", cfg)
    n1 = q.count()
    e = exact_dedup_keepers(q, "doc_id", "text")
    n2 = e.count()
    pairs = minhash_near_duplicates(
        e, "doc_id", "text", num_hashes=cfg.num_hashes,
        num_bands=cfg.num_bands, threshold=cfg.minhash_threshold,
    )
    verdict = resolve_duplicates(e, "doc_id", pairs)
    n3 = verdict.filter(F.col("is_canonical")).count()
    flagged = ngram_contamination(
        e, bench, "doc_id", "text", n=cfg.decontam_ngram
    ).count()

    out = curate(corpus, bench, cfg=cfg)
    splits = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}

    print(f"corpus              : {n0}")
    print(f"after quality gate  : {n1}  (-{n0 - n1})")
    print(f"after exact dedup   : {n2}  (-{n1 - n2})")
    print(f"near-dup canonical  : {n3}  (-{n2 - n3})")
    print(f"benchmark-flagged   : {flagged}")
    print(f"final train/test    : {splits}")
    spark.stop()


if __name__ == "__main__":
    main()
