"""Model persistence (functions/model_store.py): train → save → load →
score must be bit-identical to the in-session twin, and the sidecar
must refuse wrong-kind / wrong-params / incomplete loads."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hpc_hd_textreuse_etl_spark.functions.model_store import (
    MODEL_SCHEMA_VERSION,
    ModelStoreError,
    load_model,
    model_params,
    save_model,
)

DOCS = [
    (1, "the cat sat on the mat and the dog sat too", True),
    (2, "a quick brown fox jumps over the lazy dog", True),
    (3, "lorem ipsum dolor sit amet consectetur adipiscing", False),
    (4, "zzz qqq xxx vvv kkk jjj www yyy", False),
    (5, "the rain in spain stays mainly on the plain", True),
    (6, "foo bar baz qux quux corge grault garply", False),
]


@pytest.fixture(scope="module")
def labeled(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, is_pos boolean")


def test_nb_model_roundtrip_scores_bit_identical(spark, labeled, tmp_path):
    from hpc_hd_textreuse_etl_spark.operators.classifier import (
        nb_quality_model,
        nb_quality_scores,
    )

    params = dict(num_buckets=64, alpha=1.0, hash_family="portable", seed=7)
    model = nb_quality_model(
        labeled, "doc_id", "text", "is_pos",
        num_buckets=64, alpha=1.0, hash_family="portable", seed=7,
    )
    in_session = {
        r.doc_id: r.log_odds
        for r in nb_quality_scores(
            labeled, labeled, "doc_id", "text", "is_pos",
            num_buckets=64, hash_family="portable", model=model,
        ).collect()
    }
    path = str(tmp_path / "nb")
    save_model(model, path, "nb_quality_model", params)
    reloaded = load_model(spark, path, "nb_quality_model", params)
    again = {
        r.doc_id: r.log_odds
        for r in nb_quality_scores(
            labeled, labeled, "doc_id", "text", "is_pos",
            num_buckets=64, hash_family="portable", model=reloaded,
        ).collect()
    }
    assert again == in_session  # bit-identical, not approx
    assert model_params(spark, path) == params


def test_ivfpq_index_roundtrip_matches_in_session(spark, tmp_path):
    from hpc_hd_textreuse_etl_spark.catalog import load_table
    from hpc_hd_textreuse_etl_spark.operators.similarity import (
        ivf_index,
        ivfpq_topk,
        pq_train,
    )

    emb = load_table(
        spark, "/root/testdata/sf0.001", "embeddings", register_view=False
    )
    queries = emb.filter(F.col("vec_id") < 5)
    knobs = dict(n_cells=4, lloyd_iters=1, m=8, ks=8, pq_iters=1,
                 seed=42, dim=64, hash_family="portable")
    centroids, assignments = ivf_index(
        emb, "vec_id", "embedding", 4, 1, 42, hash_family="portable"
    )
    codebooks, codes = pq_train(
        emb, "vec_id", "embedding", 8, 8, 1, 42, 64, "portable"
    )
    base = str(tmp_path / "ivfpq")
    parts = {
        "centroids": centroids, "assignments": assignments,
        "codebooks": codebooks, "codes": codes,
    }
    index = tuple(
        save_model(df, f"{base}/{part}", f"ivfpq_{part}", knobs)
        for part, df in parts.items()
    )
    in_session = sorted(
        tuple(r)
        for r in ivfpq_topk(
            queries, emb, "vec_id", "embedding", k=3,
            index=(centroids, assignments, codebooks, codes), dim=64, m=8,
        ).collect()
    )
    reloaded = tuple(
        load_model(spark, f"{base}/{part}", f"ivfpq_{part}", knobs)
        for part in parts
    )
    again = sorted(
        tuple(r)
        for r in ivfpq_topk(
            queries, emb, "vec_id", "embedding", k=3,
            index=reloaded, dim=64, m=8,
        ).collect()
    )
    assert again == in_session and in_session
    # the saved-and-reread frames the trainer session kept scoring with
    # are the same bytes: index-from-save equals both
    third = sorted(
        tuple(r)
        for r in ivfpq_topk(
            queries, emb, "vec_id", "embedding", k=3, index=index,
            dim=64, m=8,
        ).collect()
    )
    assert third == in_session


def test_load_validations(spark, labeled, tmp_path):
    path = str(tmp_path / "m")
    save_model(labeled, path, "nb_quality_model", {"num_buckets": 64})
    with pytest.raises(ModelStoreError, match="kind"):
        load_model(spark, path, "pq_codebooks")
    with pytest.raises(ModelStoreError, match="params mismatch"):
        load_model(spark, path, "nb_quality_model", {"num_buckets": 128})
    with pytest.raises(ModelStoreError, match="no complete model"):
        load_model(spark, str(tmp_path / "absent"), "nb_quality_model")
    # params=None skips the check
    assert load_model(spark, path, "nb_quality_model").count() == len(DOCS)


def test_future_schema_version_refused(spark, labeled, tmp_path):
    path = str(tmp_path / "future")
    save_model(labeled, path, "nb_quality_model")
    spark.createDataFrame(
        [(MODEL_SCHEMA_VERSION + 1, "nb_quality_model", "{}")],
        "schema_version int, kind string, params_json string",
    ).write.mode("overwrite").parquet(f"{path}/meta")
    with pytest.raises(ModelStoreError, match="schema_version"):
        load_model(spark, path, "nb_quality_model")


def test_lr_model_roundtrip_scores_bit_identical(spark, labeled, tmp_path):
    from hpc_hd_textreuse_etl_spark.operators.classifier import (
        lr_quality_model,
        lr_quality_scores,
    )

    params = dict(num_buckets=64, iters=3, learning_rate=0.5,
                  hash_family="portable", seed=7)
    model = lr_quality_model(
        labeled, "doc_id", "text", "is_pos",
        num_buckets=64, iters=3, learning_rate=0.5,
        hash_family="portable", seed=7,
    )
    in_session = {
        r.doc_id: r.score
        for r in lr_quality_scores(
            labeled, None, "doc_id", "text", "is_pos",
            num_buckets=64, hash_family="portable", model=model,
        ).collect()
    }
    path = str(tmp_path / "lr")
    save_model(model, path, "lr_quality_model", params)
    reloaded = load_model(spark, path, "lr_quality_model", params)
    again = {
        r.doc_id: r.score
        for r in lr_quality_scores(
            labeled, None, "doc_id", "text", "is_pos",
            num_buckets=64, hash_family="portable", model=reloaded,
        ).collect()
    }
    assert again == in_session  # bit-identical through parquet
    assert any(v != in_session[1] for k, v in in_session.items() if k != 1)


def _data_files(path):
    import glob

    return [
        f for f in glob.glob(f"{path}/data/part-*")
        if not f.endswith(".crc")
    ]


def test_small_frame_compacts_to_one_file(spark, labeled, tmp_path):
    path = str(tmp_path / "small")
    save_model(labeled, path, "nb_quality_model")  # auto-probe path
    assert len(_data_files(path)) == 1


def test_large_frame_save_is_partition_aware(spark, tmp_path):
    from hpc_hd_textreuse_etl_spark.functions.model_store import (
        SINGLE_FILE_ROW_LIMIT,
    )

    big = spark.range(SINGLE_FILE_ROW_LIMIT + 10).repartition(4)
    path = str(tmp_path / "big")
    out = save_model(big, path, "ivfpq_codes")  # auto-probe path
    # corpus-proportional frames must NOT funnel through one write task
    assert len(_data_files(path)) > 1
    assert out.count() == SINGLE_FILE_ROW_LIMIT + 10
    # the explicit flag skips the probe and forces the layout
    path2 = str(tmp_path / "big_explicit")
    save_model(big, path2, "ivfpq_codes", single_file=False)
    assert len(_data_files(path2)) > 1


def test_crashed_save_leaves_no_loadable_model(spark, labeled, tmp_path):
    """Meta is the commit marker: a save that dies mid-write must leave
    the model refusable under BOTH the old and the new params — the
    stale-read window where fresh meta sits beside an old _SUCCESS data
    snapshot (or vice versa) must not exist."""
    path = str(tmp_path / "crash")
    save_model(labeled, path, "nb_quality_model", {"v": 1})
    poison = spark.range(1).select(
        F.assert_true(F.lit(False)).alias("boom")
    )
    with pytest.raises(Exception):
        save_model(poison, path, "nb_quality_model", {"v": 2})
    for params in ({"v": 1}, {"v": 2}, None):
        with pytest.raises(ModelStoreError, match="no complete model"):
            load_model(spark, path, "nb_quality_model", params)


def test_data_without_meta_refused(spark, labeled, tmp_path):
    """The crash window between the data write and the meta commit:
    data is complete (_SUCCESS) but meta never landed — load refuses."""
    from hpc_hd_textreuse_etl_spark.catalog import delete_path

    path = str(tmp_path / "nometa")
    save_model(labeled, path, "nb_quality_model")
    delete_path(spark, f"{path}/meta")
    with pytest.raises(ModelStoreError, match="no complete model"):
        load_model(spark, path, "nb_quality_model")
