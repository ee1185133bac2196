"""Serving-layer physical design (sources/serving_ddl.py): every
reference bulk-load site has a named spec, the generated DDL carries the
right access paths, and load_serving_table drives the load contract in
order (DDL → write → count assert → indexes)."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.sources import jdbc_sink
from hpc_hd_textreuse_etl_spark.sources.serving_ddl import (
    SERVING_TABLES,
    load_serving_table,
)

#: the reference's database_assets/* load sites, file by file
REFERENCE_LOAD_SITES = {
    # ids_and_mappings.py
    "textreuse_ids", "manifestation_ids", "edition_ids", "work_ids",
    "textreuse_manifestation_mapping", "textreuse_work_mapping",
    "textreuse_edition_mapping", "edition_mapping", "work_mapping",
    # downstream_metadata.py
    "manifestation_publication_date", "edition_publication_date",
    "work_earliest_publication_date", "manifestation_title",
    "actor_ids", "edition_authors", "textreuse_source_lengths",
    # downstream_clusters.py
    "clustered_defrag_pieces", "earliest_manifestation_and_pieces_by_cluster",
    # reception.py
    "reception_edges_denorm", "non_source_pieces",
    # coverages.py
    "coverages", "reception_inception_coverages",
    # additional_assets/book_based.py (the "for_ville" serving trio)
    "earliest_book_and_pieces_by_cluster",
    "reception_edges_between_books_denorm",
    "reception_inception_between_book_coverages",
}


def test_every_reference_load_site_has_a_spec():
    assert set(SERVING_TABLES) == REFERENCE_LOAD_SITES


def test_specs_generate_valid_create_and_index_sql():
    for name, spec in SERVING_TABLES.items():
        create = spec.create_sql()
        assert create.startswith(f"CREATE TABLE IF NOT EXISTS `{name}`")
        assert "ENGINE=" in create
        for col in spec.columns:
            assert f"`{col.name}`" in create, (name, col.name)
        for stmt in spec.index_sql():
            assert stmt.startswith(f"ALTER TABLE `{name}` ADD"), stmt


def test_key_access_paths_match_reference_design():
    """Spot-check the load-bearing indexes the serving queries rely on
    (coverages ratios, dense-id PKs, covering lookups, both-direction
    unique keys on non_source_pieces)."""
    cov = SERVING_TABLES["coverages"]
    assert {ix.name for ix in cov.indexes} == {
        "trs1_id", "coverage_t1_t2", "trs2_id", "coverage_t2_t1"
    }
    cdp = SERVING_TABLES["clustered_defrag_pieces"]
    assert cdp.primary_key == ("piece_id",)
    assert cdp.indexes[0].columns == ("cluster_id", "piece_id")
    nsp = SERVING_TABLES["non_source_pieces"]
    assert all(ix.unique for ix in nsp.indexes)
    assert {ix.columns for ix in nsp.indexes} == {
        ("cluster_id", "piece_id"), ("piece_id", "cluster_id")
    }
    tid = SERVING_TABLES["textreuse_ids"]
    assert tid.primary_key == ("trs_id",)
    assert tid.indexes[0].columns == ("manifestation_id", "trs_id")
    # unsigned dense ids; 64-bit piece ids (count exceeds 2^32)
    assert SERVING_TABLES["coverages"].columns[0].sql_type == "int(11) unsigned"
    assert "bigint" in cdp.columns[0].sql_type


def test_book_based_specs_match_reference_design():
    """The additional_assets/book_based.py serving trio: same access
    paths as the reference DDL (per-column indexes on the earliest-book
    table, src/dst endpoints on the denorm edges, both coverage-ratio
    indexes on the book coverages table)."""
    ebc = SERVING_TABLES["earliest_book_and_pieces_by_cluster"]
    assert [c.name for c in ebc.columns] == [
        "cluster_id", "manifestation_id_i", "piece_id"
    ]
    assert all(not c.nullable for c in ebc.columns)
    assert "bigint" in ebc.columns[2].sql_type
    assert {ix.columns for ix in ebc.indexes} == {
        ("cluster_id",), ("manifestation_id_i",), ("piece_id",)
    }
    edges = SERVING_TABLES["reception_edges_between_books_denorm"]
    assert [c.name for c in edges.columns] == [
        "src_trs_id", "src_trs_start", "src_trs_end",
        "dst_trs_id", "dst_trs_start", "dst_trs_end",
    ]
    assert {ix.columns for ix in edges.indexes} == {
        ("src_trs_id",), ("dst_trs_id",)
    }
    bc = SERVING_TABLES["reception_inception_between_book_coverages"]
    assert {ix.name for ix in bc.indexes} == {
        "src_trs_id", "reception", "dst_trs_id", "inception"
    }
    assert [c.name for c in bc.columns] == [
        c.name for c in SERVING_TABLES["reception_inception_coverages"].columns
    ]


def test_load_serving_table_executes_spec_in_contract_order(spark, monkeypatch):
    df = (
        spark.range(5)
        .selectExpr("id AS piece_id", "CAST(id % 2 AS INT) AS cluster_id")
    )
    events: list[str] = []
    monkeypatch.setattr(
        jdbc_sink, "write_jdbc", lambda *a, **k: events.append("write")
    )
    target = jdbc_sink.JdbcTarget(
        url="jdbc:fake://x", driver="org.fake.Driver", user="u", password="p"
    )
    out = load_serving_table(
        df,
        target,
        "clustered_defrag_pieces",
        execute_sql=lambda sql: events.append(sql.split()[0] + ":" + sql.split()[2].strip("`(")),
        fetch_count=lambda sql: (events.append("count"), 5)[1],
    )
    assert out["rows"] == 5
    # CREATE first, bulk write, count assert, then PK + covering index
    assert events[0].startswith("CREATE:")
    assert events[1] == "write" and events[2] == "count"
    assert events[3] == "ALTER:clustered_defrag_pieces"
    assert events[4] == "ALTER:clustered_defrag_pieces"
    assert len(events) == 5


def test_load_serving_table_refuses_missing_columns(spark):
    df = spark.range(3).withColumnRenamed("id", "piece_id")  # no cluster_id
    target = jdbc_sink.JdbcTarget(
        url="jdbc:fake://x", driver="org.fake.Driver", user="u", password="p"
    )
    with pytest.raises(ValueError, match="cluster_id"):
        load_serving_table(df, target, "clustered_defrag_pieces")
    with pytest.raises(KeyError):
        load_serving_table(df, target, "not_a_serving_table")
