"""Scale probe for the curation-selection operators.

Measures the curation operator families — SemDeDup semantic dedup,
DSIR importance weighting + Gumbel resample, CCNet-style repeated-
line dedup, the discriminative NB quality classifier, and (round 10)
the iterative LR quality filter — at production settings (xxhash64
hash family, realistic bucket/cell counts) across three rungs
(sf0.01 / sf0.1 / generated sf1, a 100× document-count span) plus an
sf2 rung for every family whose 3-point shuffle exponent read ≥ ~1
(dsir / nb / line dedup — the 4th point distinguishes linear from
inflecting), recording wall seconds and shuffle read/write bytes per
stage and fitting a log-log growth exponent per operator, exactly
like examples/scale_ladder.py does for the headline queries.

Scale-semantics notes (why each parameter moves with the rung):

- semantic_dedup's ``n_cells`` scales as ``n_vecs / 250`` — the
  SemDeDup regime where cell SIZE (hence the Σ|cell|² pair cost per
  cell) stays constant and cell COUNT grows with the corpus; a fixed
  n_cells would quadratically inflate within-cell pair work and
  measure a mis-configuration, not the operator.
- DSIR's ``num_buckets`` stays FIXED (65536): the model is a config-
  bounded broadcast by design, so the probe verifies the per-document
  featurize+fold cost is the only thing that grows.
- line dedup runs on the same deterministic 12-token segmentation the
  oracle gate uses, with the production hashed=True key.

Usage:
    python examples/scale_ladder.py --generate      # build sf1 first
    python examples/scale_ladder.py --generate-sf2  # build the DSIR rung
    python examples/curation_scale.py               # writes CURATION_SCALE.json
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
#: (label, dir, sf, only): ``only`` restricts which ops run at that
#: rung — the sf2 rung exists to give DSIR (the one family whose
#: round-8 shuffle exponent was ≥ 1, at 1.04) a FOURTH point and
#: confirm it stays linear rather than inflecting; re-measuring the
#: sublinear families there would double the probe's cost for rungs
#: their 3-point fits don't need.
RUNGS = (
    ("sf0.01", "/root/testdata/sf0.01", 0.01, None),
    ("sf0.1", "/root/testdata/sf0.1", 0.1, None),
    ("sf1", os.path.join(REPO, "scale_data", "sf1"), 1.0, None),
    # the sf2 rung gives a FOURTH point to every family whose 3-point
    # shuffle exponent read ≥ ~1 (dsir 1.04, nb 1.04, line-dedup 0.99 —
    # the round-9 verdict's symmetric-treatment ask, extended to the LR
    # trainer in round 11: its 3-point shuffle exponent read 1.026, the
    # same ≥ 1 band that earned dsir and nb their confirming 4th
    # points); plain semantic_dedup (wall exponent 0.56, clearly
    # sublinear, and the fold-assign path is not the production choice
    # for wide embeddings) stays excluded to keep the probe's cost
    # bounded.
    ("sf2", os.path.join(REPO, "scale_data", "sf2"), 2.0,
     {"dsir_weights_resample", "nb_classifier", "repeated_line_dedup",
      "semantic_dedup_matmul", "lr_classifier"}),
)


def _stage_totals(spark) -> tuple[int, int]:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def _segmented_docs(docs):
    """The deterministic 12-token line derivation shared with the
    repeated_segment_dedup oracle gate."""
    from hpc_hd_textreuse_etl_spark.functions.text import tokens

    w = tokens(F.col("text"))
    nseg = F.ceil(F.size(w) / F.lit(12.0)).cast("int")
    segs = F.when(
        F.size(w) > 0,
        F.transform(
            F.sequence(F.lit(0), nseg - 1),
            lambda j: F.concat_ws(" ", F.slice(w, j * 12 + 1, 12)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select("doc_id", F.concat_ws("\n", segs).alias("text"))


def _ops(spark, sf_dir: str):
    from hpc_hd_textreuse_etl_spark.operators.dedup import (
        dedup_repeated_lines,
        semantic_dedup,
    )
    from hpc_hd_textreuse_etl_spark.operators.dsir import dsir_log_weights
    from hpc_hd_textreuse_etl_spark.operators.sampling import gumbel_topk_sample

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_vecs = emb.count()
    n_docs = docs.count()

    def run_semantic():
        return semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.32,
            n_cells=max(8, n_vecs // 250), lloyd_iters=2,
        )

    def run_semantic_matmul():
        return semantic_dedup(
            emb, "vec_id", "embedding", threshold=0.32,
            n_cells=max(8, n_vecs // 250), lloyd_iters=2,
            assign_strategy="matmul",
        )

    def run_dsir():
        w = dsir_log_weights(
            docs, docs.filter(F.col("lang") == "en"), "doc_id", "text",
            num_buckets=65536,
        )
        return gumbel_topk_sample(w, ["doc_id"], "log_weight", max(50, n_docs // 100))

    def run_line_dedup():
        return dedup_repeated_lines(
            _segmented_docs(docs), "doc_id", "text", min_count=2, keep="first"
        )

    def run_nb_classifier():
        from hpc_hd_textreuse_etl_spark.operators.classifier import (
            nb_quality_scores,
        )

        labeled = docs.withColumn("is_pos", F.col("lang") == "en")
        scores = nb_quality_scores(
            docs, labeled, "doc_id", "text", "is_pos", num_buckets=65536
        )
        return scores.orderBy(
            F.desc("log_odds"), F.asc("doc_id")
        ).limit(max(50, n_docs // 100))

    def run_lr_classifier():
        from hpc_hd_textreuse_etl_spark.operators.classifier import (
            lr_quality_scores,
        )

        labeled = docs.withColumn("is_pos", F.col("lang") == "en")
        # iters=2 keeps the probe bounded — the exponent measures how
        # one fixed optimization scales with the corpus, and every GD
        # round is the same two corpus passes, so the fit is
        # iteration-count-invariant
        scores = lr_quality_scores(
            docs, labeled, "doc_id", "text", "is_pos",
            num_buckets=65536, iters=2,
        )
        return scores.orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(max(50, n_docs // 100))

    return {
        "semantic_dedup": run_semantic,
        "semantic_dedup_matmul": run_semantic_matmul,
        "dsir_weights_resample": run_dsir,
        "repeated_line_dedup": run_line_dedup,
        "nb_classifier": run_nb_classifier,
        "lr_classifier": run_lr_classifier,
    }, {"n_docs": n_docs, "n_vecs": n_vecs}


def _fit_exponent(points: list[tuple[float, float]]) -> float | None:
    """Least-squares slope of log(wall) vs log(sf) over the rungs."""
    pts = [(math.log(x), math.log(y)) for x, y in points if y > 0]
    if len(pts) < 2:
        return None
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    return round((n * sxy - sx * sy) / (n * sxx - sx * sx), 3)


def main() -> None:
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        release_local_checkpoints,
    )
    from hpc_hd_textreuse_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="curation_scale",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={
            "spark.ui.enabled": "true",
            # _stage_totals sums the UI's retained stages; the default
            # 1000-stage retention EVICTS early stages once the probe's
            # cumulative stage count passes it, making the before/after
            # totals non-monotonic (measured: NEGATIVE shuffle deltas on
            # the sf2 rung of the 6-family round-10 probe). Retain more
            # stages than the whole probe can create.
            "spark.ui.retainedStages": "200000",
            "spark.ui.retainedJobs": "200000",
        },
    )
    loadavg_pre = [round(v, 2) for v in os.getloadavg()]
    out: dict = {"rungs": {}, "loadavg_pre": loadavg_pre, "cpus": cpus}
    for label, sf_dir, sf, only in RUNGS:
        if not os.path.exists(sf_dir):
            print(f"skipping {label}: {sf_dir} missing", file=sys.stderr)
            continue
        ops, sizes = _ops(spark, sf_dir)
        if only is not None:
            ops = {k: v for k, v in ops.items() if k in only}
        rung: dict = {"sf": sf, **sizes, "ops": {}}
        for name, thunk in ops.items():
            # warm pass excluded (parquet footers, JIT), then best-of-2;
            # tracked checkpoint pins (ivf rounds, semantic_dedup
            # assignments, DSIR doc counts) are released after every
            # run so later measurements never fight earlier runs'
            # pinned storage (the pipeline_scale.py hygiene).
            def run_once():
                thunk().write.format("noop").mode("overwrite").save()
                release_local_checkpoints()
                spark.catalog.clearCache()

            run_once()
            walls = []
            sh = None
            for _ in range(2):
                r0, w0 = _stage_totals(spark)
                t0 = time.perf_counter()
                run_once()
                walls.append(time.perf_counter() - t0)
                r1, w1 = _stage_totals(spark)
                sh = (r1 - r0, w1 - w0)
            rung["ops"][name] = {
                "wall_sec": round(min(walls), 3),
                "shuffle_read_mb": round(sh[0] / 1e6, 2),
                "shuffle_write_mb": round(sh[1] / 1e6, 2),
            }
            print(label, name, rung["ops"][name], flush=True)
        out["rungs"][label] = rung
    if not out["rungs"]:
        print("no rung directories found — nothing measured", file=sys.stderr)
        spark.stop()
        sys.exit(1)
    # per-op exponents over whatever rungs ran
    exps = {}
    for name in next(iter(out["rungs"].values()))["ops"]:
        pts = [
            (r["sf"], r["ops"][name]["wall_sec"])
            for r in out["rungs"].values()
            if name in r["ops"]
        ]
        spts = [
            (r["sf"], r["ops"][name]["shuffle_write_mb"])
            for r in out["rungs"].values()
            if name in r["ops"]
        ]
        exps[name] = {
            "wall_exponent": _fit_exponent(pts),
            "shuffle_write_exponent": _fit_exponent(spts),
        }
    out["exponents"] = exps
    out["loadavg_post"] = [round(v, 2) for v in os.getloadavg()]
    path = os.path.join(REPO, "CURATION_SCALE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
