"""Connected components: correctness on hand-built graphs, orientation /
duplicate insensitivity, partition-count independence, isolated nodes."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.operators.graph import connected_components


def _run(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    n = spark.createDataFrame([(x,) for x in nodes], "node long") if nodes else None
    got = connected_components(e, nodes=n, **kw)
    return {(r.node, r.component) for r in got.collect()}


def test_path_graph_collapses_to_min(spark, tmp_path):
    edges = [(i, i + 1) for i in range(1, 10)]
    got = _run(spark, edges, checkpoint_dir=str(tmp_path))
    assert got == {(i, 1) for i in range(1, 11)}


def test_two_cliques_and_bridge(spark, tmp_path):
    clique = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = clique([1, 2, 3]) + clique([10, 11, 12])
    got = _run(spark, edges, checkpoint_dir=str(tmp_path / "a"))
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10)}
    got2 = _run(spark, edges + [(3, 10)], checkpoint_dir=str(tmp_path / "b"))
    assert got2 == {(n, 1) for n in [1, 2, 3, 10, 11, 12]}


def test_orientation_duplicates_self_loops(spark, tmp_path):
    edges = [(2, 1), (1, 2), (2, 3), (3, 3), (3, 2)]
    got = _run(spark, edges, checkpoint_dir=str(tmp_path))
    assert got == {(1, 1), (2, 1), (3, 1)}


def test_isolated_nodes_label_themselves(spark, tmp_path):
    got = _run(spark, [(1, 2)], nodes=[1, 2, 7, 9], checkpoint_dir=str(tmp_path))
    assert got == {(1, 1), (2, 1), (7, 7), (9, 9)}


def test_partition_count_independent(spark, tmp_path):
    edges = [(i, i + 1) for i in range(1, 30)] + [(100, 101), (101, 102)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = connected_components(e.repartition(1), checkpoint_dir=str(tmp_path / "p1"))
    b = connected_components(e.repartition(17), checkpoint_dir=str(tmp_path / "p17"))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_no_fixpoint_raises(spark, tmp_path):
    e = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], "src long, dst long")
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(e, max_iter=1, checkpoint_dir=str(tmp_path))
