#!/usr/bin/env python
"""End-to-end demo: what a user of the reference runs here instead.

Builds a small zip-of-JSONL corpus, registers the full pipeline as
registry recipes (the reference's asset DAG equivalent), materializes
everything to parquet snapshots, and prints the serving tables.

    python examples/textreuse_demo.py [output_dir]
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import zipfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.plans import textreuse as TR
from hpc_hd_textreuse_etl_spark.plans.qc import qc_summary
from hpc_hd_textreuse_etl_spark.plans.registry import Registry
from hpc_hd_textreuse_etl_spark.session import get_spark
from hpc_hd_textreuse_etl_spark.sources.zip_jsonl import read_zip_jsonl

HIT_SCHEMA = (
    "text1_id string, text2_id string, text1_text_start int, text1_text_end int, "
    "text2_text_start int, text2_text_end int, align_length int, positives_percent double"
)


def make_corpus(workdir: str) -> str:
    hits = [
        {"text1_id": "0287901000", "text2_id": "A00003.main", "text1_text_start": 100,
         "text1_text_end": 200, "text2_text_start": 150, "text2_text_end": 250,
         "align_length": 100, "positives_percent": 95.0},
        {"text1_id": "0287901000", "text2_id": "NICNF-0001", "text1_text_start": 105,
         "text1_text_end": 205, "text2_text_start": 300, "text2_text_end": 400,
         "align_length": 100, "positives_percent": 92.0},
        {"text1_id": "A00003.main", "text2_id": "NICNF-0001", "text1_text_start": 150,
         "text1_text_end": 250, "text2_text_start": 300, "text2_text_end": 400,
         "align_length": 100, "positives_percent": 91.0},
        {"text1_id": "0287901000", "text2_id": "0399900200", "text1_text_start": 600,
         "text1_text_end": 650, "text2_text_start": 10, "text2_text_end": 60,
         "align_length": 50, "positives_percent": 99.0},
    ]
    path = os.path.join(workdir, "blast_hits.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("tr_output_001.jsonl", "\n".join(json.dumps(h) for h in hits))
    return path


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="textreuse-demo-")
    spark = get_spark(app_name="textreuse-demo")
    zip_path = make_corpus(out)

    docs = {"0287901000": 1700, "A00003.main": 1700, "NICNF-0001": 1750, "0399900200": 1800}

    reg = Registry()
    reg.add("raw_hits", builder=lambda s: read_zip_jsonl(s, zip_path, HIT_SCHEMA))
    reg.add("textreuse_ids", deps=["raw_hits"],
            builder=lambda s, raw_hits: TR.textreuse_ids(raw_hits))
    reg.add("textreuses", deps=["raw_hits", "textreuse_ids"],
            builder=lambda s, raw_hits, textreuse_ids: TR.textreuses(raw_hits, textreuse_ids))
    reg.add("orig_pieces", deps=["textreuses"],
            builder=lambda s, textreuses: TR.orig_pieces(textreuses))
    reg.add("orig_textreuses", deps=["textreuses", "orig_pieces"],
            builder=lambda s, textreuses, orig_pieces: TR.orig_textreuses(textreuses, orig_pieces))

    from hpc_hd_textreuse_etl_spark.operators import defrag as D

    reg.add("piece_id_mappings", deps=["orig_pieces"],
            builder=lambda s, orig_pieces: D.piece_id_mappings(orig_pieces))
    reg.add("defrag_pieces", deps=["orig_pieces", "piece_id_mappings"],
            builder=lambda s, orig_pieces, piece_id_mappings: D.defrag_pieces(orig_pieces, piece_id_mappings))
    reg.add("defrag_textreuses", deps=["orig_textreuses", "piece_id_mappings"],
            builder=lambda s, orig_textreuses, piece_id_mappings: D.defrag_textreuses(
                orig_textreuses.select("piece1_id", "piece2_id"), piece_id_mappings))
    reg.add("clustered_defrag_pieces", deps=["defrag_textreuses"],
            builder=lambda s, defrag_textreuses: TR.cluster_pieces(defrag_textreuses, max_iter=30))

    def dates_builder(s, textreuse_ids):
        rows = [(name, datetime.date(year, 1, 1)) for name, year in docs.items()]
        d = s.createDataFrame(rows, "text_name string, publication_date date")
        return textreuse_ids.join(d, "text_name").select("trs_id", "publication_date")

    reg.add("manifestation_dates", deps=["textreuse_ids"], builder=dates_builder)
    reg.add("earliest_pieces", deps=["clustered_defrag_pieces", "defrag_pieces", "manifestation_dates"],
            builder=lambda s, clustered_defrag_pieces, defrag_pieces, manifestation_dates:
                TR.earliest_pieces_by_cluster(clustered_defrag_pieces, defrag_pieces, manifestation_dates))
    reg.add("reception_edges", deps=["clustered_defrag_pieces", "earliest_pieces"],
            builder=lambda s, clustered_defrag_pieces, earliest_pieces:
                TR.reception_edges(clustered_defrag_pieces, earliest_pieces))
    reg.add("reception_edges_denorm", deps=["reception_edges", "defrag_pieces"],
            builder=lambda s, reception_edges, defrag_pieces:
                TR.reception_edges_denorm(reception_edges, defrag_pieces))

    assets = reg.materialise(spark, os.path.join(out, "assets"))

    print(f"\nMaterialized {len(assets)} assets under {out}/assets:")
    for name, df in assets.items():
        print(f"  {name}: {qc_summary(df)['rows']} rows")
    print("\nreception_edges_denorm (who received text from whom, span-level):")
    assets["reception_edges_denorm"].orderBy("src_trs_id", "dst_trs_id").show()
    spark.stop()


if __name__ == "__main__":
    main()
