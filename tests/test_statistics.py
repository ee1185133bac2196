"""Full source_piece_statistics (10-table snowflake) with
hand-computable work/author semantics."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.plans.textreuse import source_piece_statistics_full


@pytest.fixture(scope="module")
def stats(spark):
    # one source piece (1) with reception edges to pieces 2, 3, 4
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src_piece_id long, dst_piece_id long"
    )
    # pieces live in docs 10 (src), 20, 30, 40
    pieces = spark.createDataFrame(
        [
            (1, 10, 100, 250),
            (2, 20, 0, 50),
            (3, 30, 0, 50),
            (4, 40, 0, 50),
        ],
        "piece_id long, trs_id int, trs_start int, trs_end int",
    )
    clustered = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7), (4, 7)], "piece_id long, cluster_id long"
    )
    # editions: doc→edition 1:1; works: src W1, dst2 W1 (same), dst3 W2, dst4 W3
    tem = spark.createDataFrame(
        [(10, 110), (20, 120), (30, 130), (40, 140)], "trs_id int, edition_id_i int"
    )
    twm = spark.createDataFrame(
        [(10, 1), (20, 1), (30, 2), (40, 3)], "trs_id int, work_id_i int"
    )
    # authors: src A1; dst2 A9; dst3 A1 (same author); dst4 none (NULL)
    ea = spark.createDataFrame(
        [(110, 1), (120, 9), (130, 1), (140, None)],
        "edition_id_i int, actor_id_i int",
    )
    df = source_piece_statistics_full(edges, pieces, clustered, tem, twm, ea)
    return {r.piece_id: r for r in df.collect()}


def test_statistics_shape(stats):
    assert set(stats) == {1}
    r = stats[1]
    assert r.cluster_id == 7
    assert r.piece_length == 150
    assert r.num_reception_edges == 3


def test_different_works_excludes_same_work(stats):
    # dst works {W1, W2, W3}; src work W1 → different = {W2, W3}
    assert stats[1].num_different_work_ids == 2


def test_different_author_works(stats):
    # src author A1. dst2: author A9 (different) → count W1 (dst2's work!)
    # dst3: author A1 (same) → not counted. dst4: author NULL → counted (W3).
    assert stats[1].num_work_ids_different_authors == 2
