"""Metadata layer: FIXTURES.md §3-§7 shaped inputs exercising every
placeholder/fallback branch of the entity model."""

from __future__ import annotations

import datetime

import pytest

from hpc_hd_textreuse_etl_spark.plans.metadata import build_metadata


@pytest.fixture(scope="module")
def meta(spark):
    ecco = spark.createDataFrame(
        [
            # normal: estc mapping + usable ecco date
            ("0287901000", "T1", 17580101.0, "Ecco Title One"),
            # sentinel date → ESTC year fallback
            ("0399900200", "T2", 10000101.0, "Ecco Title Two"),
            # no ESTC id → NULL edition id propagates
            ("0401000300", None, 17200101.0, "Ecco Title Three"),
        ],
        "ecco_id string, estc_id string, ecco_date_start double, ecco_full_title string",
    )
    eebo = spark.createDataFrame(
        [
            # estc-mapped with free-text date
            ("A00003", "T1", "April 24, 1649", "Eebo Title A"),
            # no estc → eebo id becomes placeholder edition
            ("A00007", None, "1690-1697", "Eebo Title B"),
            # NULL id row must be dropped
            (None, "T9", "1700", "Ghost"),
            # duplicate mapping row for A00003 with a different title (MAX dedup)
            ("A00003", "T1", "April 24, 1649", "Eebo Title A2"),
        ],
        "eebo_tcp_id string, estc_id string, eebo_tls_publication_date string, eebo_tls_title string",
    )
    news = spark.createDataFrame(
        [("N0001-01", datetime.date(1732, 1, 1), "Daily Courant")],
        "article_id string, issue_start_date date, newspaper_title string",
    )
    estc = spark.createDataFrame(
        [
            ("T1", "W1", 1650.0),
            ("T2", None, 1701.0),  # work falls back to manifestation
        ],
        "estc_id string, work_id string, publication_year double",
    )
    actors = spark.createDataFrame(
        [("A1", "Defoe, Daniel"), ("A2", "Swift, Jonathan")],
        "actor_id string, name_unified string",
    )
    links = spark.createDataFrame(
        [
            ("T1", "A1", 1),
            ("T1", "A2", 0),  # non-author role must be excluded
            ("T2", "A2", 1),
        ],
        "estc_id string, actor_id string, actor_role_author int",
    )
    trs_ids = spark.createDataFrame(
        [
            (1, "0287901000", "0287901000", None),
            (2, "A00003.main", "A00003", "main"),
            (3, "N0001-01", "N0001-01", None),
        ],
        "trs_id int, text_name string, manifestation_id string, structure_name string",
    )
    return build_metadata(trs_ids, ecco, eebo, news, estc, actors, links)


def test_manifestation_ids_dense_and_null_filtered(meta):
    rows = meta.manifestation_ids.collect()
    names = sorted(r.manifestation_id for r in rows)
    assert names == ["0287901000", "0399900200", "0401000300", "A00003", "A00007", "N0001-01"]
    assert sorted(r.manifestation_id_i for r in rows) == list(range(1, 7))


def test_edition_placeholders(meta):
    eids = {r.edition_id: r.edition_id_i for r in meta.edition_ids.collect()}
    # T1 shared by ecco 0287901000 and eebo A00003; A00007 and
    # 0401000300 become their own placeholder editions; each newspaper
    # article is its own edition
    assert set(eids) >= {"T1", "T2", "A00007", "0401000300", "N0001-01"}
    assert meta.edition_mapping.count() == 6  # one per manifestation


def test_work_fallback_to_manifestation(meta):
    wids = {r.work_id for r in meta.work_ids.collect()}
    # W1 from ESTC; T2's work NULL → falls back to manifestation id
    assert "W1" in wids
    assert "0399900200" in wids      # estc T2 has no work
    assert "A00007" in wids          # placeholder edition → no estc row
    assert "N0001-01" in wids


def test_edition_authors_role_filter(meta):
    pairs = {(r.edition_id_i, r.actor_id_i) for r in meta.edition_authors.collect()}
    eids = {r.edition_id: r.edition_id_i for r in meta.edition_ids.collect()}
    aids = {r.actor_id: r.actor_id_i for r in meta.actor_ids.collect()}
    assert (eids["T1"], aids["A1"]) in pairs
    assert (eids["T1"], aids["A2"]) not in pairs  # role 0 excluded
    assert (eids["T2"], aids["A2"]) in pairs
    # author-less editions keep a NULL actor row
    assert (eids["A00007"], None) in pairs


def test_publication_date_branches(meta):
    mids = {r.manifestation_id: r.manifestation_id_i for r in meta.manifestation_ids.collect()}
    dates = {
        r.manifestation_id_i: r.publication_date
        for r in meta.manifestation_publication_date.collect()
    }
    assert dates[mids["0287901000"]] == datetime.date(1758, 1, 1)  # ecco int date
    assert dates[mids["0399900200"]] == datetime.date(1701, 1, 1)  # sentinel → estc year
    assert dates[mids["A00003"]] == datetime.date(1649, 4, 24)     # LLLL d, yyyy
    assert dates[mids["A00007"]] == datetime.date(1690, 1, 1)      # range start
    assert dates[mids["N0001-01"]] == datetime.date(1732, 1, 1)    # newspaper


def test_hierarchy_min_dates(meta):
    eids = {r.edition_id: r.edition_id_i for r in meta.edition_ids.collect()}
    edates = {r.edition_id_i: r.publication_date for r in meta.edition_publication_date.collect()}
    # edition T1 spans ecco(1758) and eebo(1649) → min 1649
    assert edates[eids["T1"]] == datetime.date(1649, 4, 24)
    wids = {r.work_id: r.work_id_i for r in meta.work_ids.collect()}
    wdates = {r.work_id_i: r.publication_date for r in meta.work_earliest_publication_date.collect()}
    assert wdates[wids["W1"]] == datetime.date(1649, 4, 24)


def test_titles_max_dedup(meta):
    mids = {r.manifestation_id: r.manifestation_id_i for r in meta.manifestation_ids.collect()}
    titles = {r.manifestation_id_i: r.title for r in meta.manifestation_title.collect()}
    assert titles[mids["A00003"]] == "Eebo Title A2"  # MAX of the two
    assert titles[mids["N0001-01"]] == "Daily Courant"


def test_trs_mappings_total(meta):
    tm = meta.trs_mappings
    assert tm["textreuse_manifestation_mapping"].count() == 3
    assert {r.trs_id for r in tm["textreuse_work_mapping"].collect()} == {1, 2, 3}
