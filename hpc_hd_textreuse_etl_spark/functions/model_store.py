"""Trained-model persistence: save/load small model DataFrames through
the catalog with a typed, validated metadata sidecar.

Every trainable artifact in this engine — NB quality-classifier models
(operators/classifier.py), LR quality-filter weights, PQ codebooks and
codes, IVF coarse centroids and assignments (operators/similarity.py),
DSIR bucket models — is a small DataFrame (rows ∝ a CONFIG like
``num_buckets`` or ``m·ks``, or ∝ the corpus for code/assignment
tables, never wider than a few columns). A real pipeline trains once
and scores many ingests across many sessions, so the model must outlive
the SparkSession that trained it. This module is that contract:

- :func:`save_model` writes the frame as a parquet snapshot under
  ``{path}/data`` (the catalog's write-once semantics — ``_SUCCESS``
  gated) plus a one-row ``{path}/meta`` parquet carrying
  ``(schema_version, kind, params_json)``.
- :func:`load_model` refuses to load a different ``kind`` (scoring a
  corpus with PQ codebooks where an NB model was expected is garbage,
  not an error Spark would ever raise) and, when the caller states the
  params it is about to score with, refuses on any mismatch — the
  mixed-parameter-table footgun every delta-dedup docstring warns
  about (operators/dedup.py minhash_near_duplicates_delta), enforced
  instead of documented.

Round-trip exactness: model columns are bigint/int/double/arrays
thereof; parquet stores doubles bit-exactly, so a reloaded model scores
bit-identically to its in-session twin (gated by the
``quality_classifier_ranking_reloaded`` / ``ann_ivfpq_topk_reloaded``
contract queries and tests/test_model_store.py).

The reference engine has no model artifacts at all (SURVEY.md §2) —
this is plumbing for the beyond-parity operator families.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from hpc_hd_textreuse_etl_spark.catalog import delete_path, snapshot_is_valid

#: bump when the meta layout changes; load_model refuses newer versions
#: (an old engine reading a future model is the unrecoverable direction)
MODEL_SCHEMA_VERSION = 1

#: frames at or below this row count are compacted to one file on save
#: (config-sized models: NB/LR weights, centroids, codebooks); above it
#: the frame keeps its own partitioning — IVF assignments and PQ codes
#: are one row per corpus vector, and funnelling a corpus-proportional
#: table through a single write task is an hours-long single-threaded
#: bottleneck (plus executor-memory risk) at 100 TB
SINGLE_FILE_ROW_LIMIT = 100_000


class ModelStoreError(ValueError):
    pass


def _params_json(params: dict | None) -> str:
    return json.dumps(params or {}, sort_keys=True, default=str)


def save_model(
    df: DataFrame,
    path: str,
    kind: str,
    params: dict | None = None,
    single_file: bool | None = None,
) -> DataFrame:
    """Persist a trained model frame at ``path``; returns the re-read
    (lineage-truncated) frame, so callers can keep scoring in-session
    against exactly the bytes future sessions will load. ``kind`` is a
    short tag (``"nb_quality_model"``, ``"pq_codebooks"``, ...);
    ``params`` the training knobs the scorer must match (num_buckets,
    hash_family, seed, ...). Overwrites any existing model at ``path``
    — models are derived artifacts, the training data is the source of
    truth.

    ``single_file`` controls the data layout: True compacts to one
    file (right for config-sized weight tables), False keeps the
    frame's own partitioning (right for corpus-proportional artifacts —
    IVF assignments, PQ codes — where a one-task write is the
    bottleneck), None (default) probes the row count with a bounded
    ``limit(N+1).count()`` job and compacts only at or below
    :data:`SINGLE_FILE_ROW_LIMIT`. Callers that know the frame's class
    should pass the flag and skip the probe job.

    Crash ordering — the meta sidecar is the COMMIT MARKER: it is
    deleted before anything else is touched and rewritten only after
    the data write completes, so a save that dies at ANY point leaves
    the model meta-less and :func:`load_model` refuses it. Neither
    direction of the stale pairing can occur: old data is never served
    under new params (meta was deleted first), new data is never
    served under old params (old meta is gone before data is
    overwritten)."""
    spark = df.sparkSession
    delete_path(spark, f"{path}/meta")
    if single_file is None:
        n_probe = df.limit(SINGLE_FILE_ROW_LIMIT + 1).count()
        single_file = n_probe <= SINGLE_FILE_ROW_LIMIT
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option(
        "compression", "zstd"
    ).parquet(f"{path}/data")
    spark.createDataFrame(
        [(MODEL_SCHEMA_VERSION, kind, _params_json(params))],
        "schema_version int, kind string, params_json string",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    return spark.read.parquet(f"{path}/data")


def load_model(
    spark: SparkSession,
    path: str,
    kind: str,
    params: dict | None = None,
) -> DataFrame:
    """Load a model saved by :func:`save_model`, validating the sidecar:

    - both snapshots must be complete (``_SUCCESS`` — a crashed save is
      rebuilt, never trusted; the catalog convention);
    - ``schema_version`` must be ≤ this engine's;
    - ``kind`` must equal the stored kind;
    - if ``params`` is given, it must equal the stored params EXACTLY
      (key set and values) — pass None to skip the check and introspect
      via :func:`model_params` instead."""
    for part in ("meta", "data"):
        if not snapshot_is_valid(spark, f"{path}/{part}"):
            raise ModelStoreError(
                f"no complete model snapshot at {path}/{part} "
                "(missing or crashed save)"
            )
    meta = spark.read.parquet(f"{path}/meta").first()
    if meta["schema_version"] > MODEL_SCHEMA_VERSION:
        raise ModelStoreError(
            f"model at {path} has schema_version {meta['schema_version']}, "
            f"this engine reads <= {MODEL_SCHEMA_VERSION}"
        )
    if meta["kind"] != kind:
        raise ModelStoreError(
            f"model at {path} is kind {meta['kind']!r}, expected {kind!r}"
        )
    if params is not None and _params_json(params) != meta["params_json"]:
        raise ModelStoreError(
            f"model params mismatch at {path}: stored "
            f"{meta['params_json']} != expected {_params_json(params)} — "
            "a model scored with different knobs than it was trained "
            "with produces garbage, not an error"
        )
    return spark.read.parquet(f"{path}/data")


def model_params(spark: SparkSession, path: str) -> dict:
    """The params dict a model was saved with (for introspection /
    logging; load_model's ``params=`` is the enforcement path)."""
    meta = spark.read.parquet(f"{path}/meta").first()
    return json.loads(meta["params_json"])
