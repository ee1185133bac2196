"""End-to-end text-reuse pipeline on a FIXTURES.md-shaped corpus:
every stage of the reference DAG exercised with hand-checkable numbers."""

from __future__ import annotations

import datetime

import pytest

from hpc_hd_textreuse_etl_spark.plans.textreuse import build_pipeline

E1 = "0287901000"            # ECCO (no dot)
E2 = "A00003.main_text_2"    # EEBO (dot-separated)
N1 = "NICNF0317-C00000"      # newspaper (no dot)
E3 = "0399900200"            # ECCO


@pytest.fixture(scope="module")
def pipeline(spark):
    hits = [
        # cluster 1: E1 ~ E2 ~ N1 triangle; E1 spans jittered by 5 chars
        (E1, E2, 100, 200, 150, 250, 100, 95.0),
        (E1, N1, 105, 205, 300, 400, 100, 92.0),
        (E2, N1, 150, 250, 300, 400, 100, 91.0),
        # reversed-direction duplicate of hit 1's spans (dedup check)
        (N1, E1, 300, 400, 100, 200, 100, 92.0),
        # cluster 2: E1 ~ E3, disjoint span region
        (E1, E3, 600, 650, 10, 60, 50, 99.0),
    ]
    raw = spark.createDataFrame(
        hits,
        "text1_id string, text2_id string, text1_text_start int, text1_text_end int, "
        "text2_text_start int, text2_text_end int, align_length int, positives_percent double",
    )
    sources = spark.createDataFrame(
        [(name, "x" * 1000, "c", "loc") for name in (E1, E2, N1, E3)],
        "doc_id string, text string, collection string, text_loc string",
    )
    dates = {E1: 1700, E2: 1700, N1: 1750, E3: 1800}  # E1/E2 tie
    return build_pipeline(
        raw,
        sources=sources,
        manifestation_dates=None,
        cluster_max_iter=30,
        seed=42,
    ), raw, sources, dates


def test_textreuse_ids_split(spark, pipeline):
    pipe, *_ = pipeline
    ids = {r.text_name: r for r in pipe.trs_ids.collect()}
    assert len(ids) == 4
    assert ids[E1].manifestation_id == E1 and ids[E1].structure_name is None
    assert ids[E2].manifestation_id == "A00003"
    assert ids[E2].structure_name == "main_text_2"
    assert ids[N1].structure_name is None
    # dense 1..N in sorted text_name order
    assert sorted(r.trs_id for r in ids.values()) == [1, 2, 3, 4]
    assert ids[min(ids)].trs_id == 1


def test_orig_pieces_dedup_bidirectional(spark, pipeline):
    pipe, *_ = pipeline
    pieces = pipe.orig_pieces.collect()
    # 5 hits × 2 sides = 10 spans, minus duplicates:
    # E1[100,200) appears in hits 1&4; N1[300,400) in hits 2,3,4; E2[150,250) in 1,3
    spans = {(r.trs_id, r.trs_start, r.trs_end) for r in pieces}
    assert len(pieces) == len(spans) == 6
    assert sorted(r.piece_id for r in pieces) == list(range(1, 7))


def test_defrag_merges_jittered_spans(spark, pipeline):
    pipe, *_ = pipeline
    ids = {r.text_name: r.trs_id for r in pipe.trs_ids.collect()}
    dp = [
        (r.trs_id, r.trs_start, r.trs_end)
        for r in pipe.defrag_pieces.collect()
    ]
    # E1's [100,200) and [105,205) merged into [100,205): 6 orig → 5 defrag
    assert len(dp) == 5
    assert (ids[E1], 100, 205) in dp


def test_coverages_hand_computed(spark, pipeline):
    pipe, *_ = pipeline
    ids = {r.text_name: r.trs_id for r in pipe.trs_ids.collect()}
    cov = {
        (r.trs1_id, r.trs2_id): r for r in pipe.coverages.collect()
    }
    # pair (E1, E2): E1 side covered by merged piece [100,205) = 105 chars
    pair = cov[(ids[E1], ids[E2])]
    assert pair.t1_reuses_length == 105
    assert pair.reuse_t1_t2 == pytest.approx(10.5)
    # E2 side [150,250) = 100 chars of its 1000-char text
    assert pair.t2_reuses_length == 100
    assert pair.reuse_t2_t1 == pytest.approx(10.0)


def test_clusters_shape(spark, pipeline):
    pipe, *_ = pipeline
    ids = {r.text_name: r.trs_id for r in pipe.trs_ids.collect()}
    piece_doc = {
        r.piece_id: (r.trs_id, r.trs_start) for r in pipe.defrag_pieces.collect()
    }
    clusters = {r.piece_id: r.cluster_id for r in pipe.clustered.collect()}
    # triangle pieces (E1[100,205), E2[150,250), N1[300,400)) share a label
    tri = [
        pid
        for pid, (trs, start) in piece_doc.items()
        if (trs, start) in {(ids[E1], 100), (ids[E2], 150), (ids[N1], 300)}
    ]
    pair = [
        pid
        for pid, (trs, start) in piece_doc.items()
        if (trs, start) in {(ids[E1], 600), (ids[E3], 10)}
    ]
    assert len({clusters[p] for p in tri}) == 1
    assert len({clusters[p] for p in pair}) == 1
    assert clusters[tri[0]] != clusters[pair[0]]


def test_reception_with_date_ties(spark, pipeline):
    pipe, raw, sources, dates = pipeline
    from hpc_hd_textreuse_etl_spark.plans.textreuse import (
        earliest_pieces_by_cluster,
        reception_edges,
        source_piece_statistics,
    )

    ids = {r.text_name: r.trs_id for r in pipe.trs_ids.collect()}
    mdates = spark.createDataFrame(
        [(ids[n], datetime.date(y, 1, 1)) for n, y in dates.items()],
        "trs_id int, publication_date date",
    )
    earliest = earliest_pieces_by_cluster(pipe.clustered, pipe.defrag_pieces, mdates)
    e_rows = earliest.collect()
    # cluster 1: E1 and E2 tie at 1700 → both their pieces are sources
    by_cluster = {}
    for r in e_rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.trs_id)
    assert {ids[E1], ids[E2]} in by_cluster.values()  # tie kept

    edges = reception_edges(pipe.clustered, earliest)
    e = edges.collect()
    # cluster 1: 2 source pieces × 1 non-source (N1) = 2 edges
    # cluster 2: 1 source (E1@1700) × 1 non-source (E3) = 1 edge
    assert len(e) == 3

    stats = source_piece_statistics(edges, pipe.defrag_pieces, pipe.clustered)
    s = {r.src_piece_id: r for r in stats.collect()}
    assert all(r.num_reception_edges == 1 for r in s.values())
    assert all(r.num_different_documents == 1 for r in s.values())

    from hpc_hd_textreuse_etl_spark.plans.textreuse import reception_edges_denorm

    denorm = reception_edges_denorm(edges, pipe.defrag_pieces).collect()
    assert len(denorm) == 3
    # every denorm row carries full span info for both sides
    assert all(
        r.src_trs_end > r.src_trs_start and r.dst_trs_end > r.dst_trs_start
        for r in denorm
    )


def test_book_restricted_reception(spark, pipeline):
    """FIXTURES §8: a cluster whose earliest member overall is a
    newspaper, but the earliest *book* differs — the restricted variant
    must pick the book."""
    pipe, raw, sources, dates = pipeline
    from hpc_hd_textreuse_etl_spark.plans.textreuse import restricted_reception

    ids = {r.text_name: r.trs_id for r in pipe.trs_ids.collect()}
    # shift dates so the NEWSPAPER is the earliest member of cluster 1
    book_dates = {E1: 1750, E2: 1760, N1: 1700, E3: 1800}
    mdates = spark.createDataFrame(
        [(ids[n], datetime.date(y, 1, 1)) for n, y in book_dates.items()],
        "trs_id int, publication_date date",
    )
    books = spark.createDataFrame(
        [(ids[E1],), (ids[E2],), (ids[E3],)], "trs_id int"
    )  # N1 (newspaper) not a book
    earliest, edges = restricted_reception(
        pipe.clustered, pipe.defrag_pieces, mdates, books
    )
    e_rows = earliest.collect()
    # cluster 1's earliest BOOK is E1 (1750), not the newspaper (1700)
    trs_by_cluster = {}
    for r in e_rows:
        trs_by_cluster.setdefault(r.cluster_id, set()).add(r.trs_id)
    assert {ids[E1]} in trs_by_cluster.values()
    # newspaper pieces appear in no edge (neither src nor dst)
    piece_doc = {r.piece_id: r.trs_id for r in pipe.defrag_pieces.collect()}
    for r in edges.collect():
        assert piece_doc[r.src_piece_id] != ids[N1]
        assert piece_doc[r.dst_piece_id] != ids[N1]
