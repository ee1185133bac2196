"""Chinese Whispers clustering: deterministic (seeded) convergence on
known graph shapes (FIXTURES.md §8: disjoint cliques + bridging chain)."""

from __future__ import annotations

import pytest

import itertools

from hpc_hd_textreuse_etl_spark.operators.clustering import (
    adjacency_list,
    chinese_whispers,
    clustered_pieces,
)


def _clique(nodes):
    return [(a, b) for a, b in itertools.combinations(nodes, 2)]


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "piece1_id long, piece2_id long")
    adj = adjacency_list(df)
    state, iters = chinese_whispers(adj, **kw)
    return {r.piece_id: r.cluster_id for r in clustered_pieces(state).collect()}, iters


def test_disjoint_cliques_converge(spark):
    edges = _clique(range(1, 6)) + _clique(range(10, 15))
    clusters, iters = _run(spark, edges, max_iter=30, seed=42)
    assert iters < 30  # converged, not capped
    assert len(clusters) == 10
    a = {clusters[n] for n in range(1, 6)}
    b = {clusters[n] for n in range(10, 15)}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_bridged_cliques_converge(spark):
    edges = _clique(range(1, 7)) + _clique(range(10, 16)) + [(6, 10)]
    clusters, iters = _run(spark, edges, max_iter=50, seed=42)
    assert iters < 50
    # each clique interior agrees on a single label
    assert len({clusters[n] for n in range(1, 6)}) == 1
    assert len({clusters[n] for n in range(11, 16)}) == 1


def test_resume_matches_uninterrupted_run(spark, tmp_path):
    """Interrupt after 3 iterations, resume from the checkpoint dir:
    the final clustering must equal the uninterrupted run's (coins are
    keyed on absolute iteration)."""
    edges = _clique(range(1, 6)) + _clique(range(10, 15)) + [(5, 10)]
    df = spark.createDataFrame(edges, "piece1_id long, piece2_id long")

    straight, straight_iters = _run(spark, edges, max_iter=25, seed=3)

    ckpt = str(tmp_path / "clp")
    adj = adjacency_list(df)
    chinese_whispers(adj, max_iter=3, seed=3, checkpoint=ckpt)
    state, resumed_iters = chinese_whispers(
        adj, max_iter=25, seed=3, checkpoint=ckpt, resume=True
    )
    resumed = {r.piece_id: r.cluster_id for r in clustered_pieces(state).collect()}
    assert resumed == straight
    assert resumed_iters == straight_iters


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_tie_freeze_converges_where_reference_semantics_never_do(spark):
    """Round-8 convergence fix: a bridge vertex tied between two stable
    equal cliques votes 1-1 forever — under the reference's semantics
    (tie_freeze=None) it stays active and the loop always pays max_iter
    (measured here: still-active vertices at the cap). With the default
    tie-freeze, vertices whose vote map is static for k iterations are
    frozen and the loop terminates by CONVERGENCE, with the same
    clique structure."""
    edges = _clique(range(1, 6)) + _clique(range(10, 15)) + [(5, 20), (10, 20)]
    df = spark.createDataFrame(edges, "piece1_id long, piece2_id long")

    state_ref, iters_ref = chinese_whispers(
        adjacency_list(df), max_iter=20, seed=42, tie_freeze=None
    )
    assert iters_ref == 20  # capped, not converged
    assert state_ref.filter("active").count() > 0  # ties still churning

    state, iters = chinese_whispers(adjacency_list(df), max_iter=20, seed=42)
    assert iters < 20  # converged before the cap
    assert state.filter("active").count() == 0
    clusters = {r.piece_id: r.cluster_id for r in clustered_pieces(state).collect()}
    assert len({clusters[n] for n in range(1, 6)}) == 1
    assert len({clusters[n] for n in range(10, 15)}) == 1
    assert clusters[1] != clusters[10]
    assert clusters[20] in (clusters[1], clusters[10])


def test_min_active_floor_terminates_early(spark):
    """The activity floor stops the loop once the active count is within
    the floor — iteration 0 when the floor exceeds the vertex count, and
    earlier-than-exact convergence for a fractional floor — while exact
    semantics (floor 0) still run to zero active."""
    edges = _clique(range(1, 6)) + _clique(range(10, 15))
    df = spark.createDataFrame(edges, "piece1_id long, piece2_id long")

    state, iters = chinese_whispers(adjacency_list(df), max_iter=30, min_active=100)
    assert iters == 0  # floor above vertex count: nothing to do

    _, exact_iters = chinese_whispers(adjacency_list(df), max_iter=30)
    _, floored_iters = chinese_whispers(
        adjacency_list(df), max_iter=30, min_active=0.5
    )
    assert floored_iters <= exact_iters
    assert exact_iters < 30  # exact semantics unchanged: converges to 0


def test_seeded_runs_reproduce(spark):
    edges = _clique(range(1, 6)) + [(5, 6), (6, 7)] + _clique(range(7, 12))
    c1, _ = _run(spark, edges, max_iter=30, seed=7)
    c2, _ = _run(spark, edges, max_iter=30, seed=7)
    assert c1 == c2


def test_adjacency_materialization_is_trajectory_neutral(spark):
    """materialize_adjacency is a PHYSICAL knob (one durable adjacency
    snapshot vs recomputing the lazy plan every iteration): both settings
    must walk the identical seeded trajectory — same clusters, same
    iteration count."""
    edges = _clique(range(1, 7)) + _clique(range(10, 16)) + [(6, 10), (3, 12)]
    c_mat, it_mat = _run(spark, edges, max_iter=30, seed=11)
    c_lazy, it_lazy = _run(
        spark, edges, max_iter=30, seed=11, materialize_adjacency=False
    )
    assert c_mat == c_lazy
    assert it_mat == it_lazy


def test_portable_hash_family_matches_contract(spark):
    """hash_family='portable' (the DuckDB-reproducible coin family,
    plans/queries.py chinese_whispers_portable) converges on the clique
    fixture, reproduces bit-for-bit across runs, and rejects unknown
    families before any work."""
    import pytest

    edges = _clique(range(1, 6)) + _clique(range(10, 15))
    clusters, iters = _run(
        spark, edges, max_iter=30, seed=42, hash_family="portable"
    )
    assert iters < 30
    assert len(clusters) == 10
    a = {clusters[n] for n in range(1, 6)}
    b = {clusters[n] for n in range(10, 15)}
    assert len(a) == 1 and len(b) == 1 and a != b
    again, _ = _run(spark, edges, max_iter=30, seed=42, hash_family="portable")
    assert again == clusters
    with pytest.raises(ValueError, match="hash_family"):
        _run(spark, edges, hash_family="sha1")
