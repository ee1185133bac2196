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


# ---------------------------------------------------------------------------
# Integer-lattice PageRank
# ---------------------------------------------------------------------------

from pyspark.sql import functions as F  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.graph import pagerank_scaled  # noqa: E402


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src bigint, dst bigint")


def test_pagerank_hand_computed_cycle(spark):
    # 3-cycle: perfectly symmetric, every node keeps the uniform rank
    # (up to the floor-division lattice)
    e = _edges(spark, [(1, 2), (2, 3), (3, 1)])
    scale = 3_000_000  # divisible by 3 => r0 exact
    out = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_scaled(e, iterations=2, scale=scale).collect()
    }
    base = (scale * 15) // (100 * 3)
    r0 = scale // 3
    r1 = base + (r0 * 85) // 100
    r2 = base + (r1 * 85) // 100
    assert out == {1: r2, 2: r2, 3: r2}


def test_pagerank_sink_accumulates_hub_splits(spark):
    # 1 -> {2, 3}: the hub's mass splits by outdeg; 2 and 3 tie
    e = _edges(spark, [(1, 2), (1, 3)])
    out = {
        r["node"]: r["rank_scaled"]
        for r in pagerank_scaled(e, iterations=1, scale=300).collect()
    }
    base = (300 * 15) // (100 * 3)  # 0 on this tiny lattice... keep exact
    r0 = 300 // 3
    contrib = (r0 * 85) // (100 * 2)
    assert out[2] == out[3] == base + contrib
    assert out[1] == base  # dangling inflow: nothing points at 1


def test_pagerank_deterministic_under_repartition(spark):
    import random

    rng = random.Random(11)
    pairs = [(rng.randrange(50), rng.randrange(50)) for _ in range(300)]
    pairs = [(a, b) for a, b in pairs if a != b]
    a = sorted(map(tuple, pagerank_scaled(_edges(spark, pairs), 3).collect()))
    b = sorted(
        map(
            tuple,
            pagerank_scaled(_edges(spark, pairs).repartition(17), 3).collect(),
        )
    )
    assert a == b


def test_pagerank_mass_never_exceeds_scale(spark):
    # floor division only loses mass (dangling + lattice truncation)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)])
    total = (
        pagerank_scaled(e, iterations=4)
        .agg(F.sum("rank_scaled").alias("s"))
        .collect()[0]["s"]
    )
    assert total <= 1_000_000_000_000


def test_pagerank_zero_iterations_is_uniform(spark):
    e = _edges(spark, [(1, 2), (2, 1)])
    out = {r["node"]: r["rank_scaled"] for r in pagerank_scaled(e, 0, scale=10).collect()}
    assert out == {1: 5, 2: 5}


# ---------------------------------------------------------------------------
# triangle_count (degree-ordered orientation)
# ---------------------------------------------------------------------------

from itertools import combinations  # noqa: E402
import random  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.graph import triangle_count  # noqa: E402


def _tri(spark, edges):
    e = spark.createDataFrame(edges, "src long, dst long")
    return {(r.node, r.triangles) for r in triangle_count(e).collect()}


def brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    adj = {n: set() for n in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    counts = {n: 0 for n in nodes}
    for a, b, c in combinations(nodes, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                counts[n] += 1
    return set(counts.items())


def test_triangle_hand_graphs(spark):
    # single triangle
    assert _tri(spark, [(1, 2), (2, 3), (3, 1)]) == {(1, 1), (2, 1), (3, 1)}
    # square (no diagonal): zero triangles everywhere
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1)]) == {
        (1, 0), (2, 0), (3, 0), (4, 0)
    }
    # square + one diagonal: two triangles sharing the diagonal
    assert _tri(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)]) == {
        (1, 2), (3, 2), (2, 1), (4, 1)
    }
    # star: hub has huge degree, zero triangles (skew-shaped input)
    assert _tri(spark, [(0, i) for i in range(1, 8)]) == {
        (i, 0) for i in range(8)
    }


def test_triangle_duplicate_orientation_selfloop_insensitive(spark):
    base = [(1, 2), (2, 3), (3, 1)]
    noisy = base + [(2, 1), (3, 2), (1, 1), (2, 3), (3, 3)]
    assert _tri(spark, noisy) == _tri(spark, base)


def test_triangle_random_graph_matches_brute_force(spark):
    rng = random.Random(17)
    nodes = list(range(24))
    edges = [
        (a, b) for a, b in combinations(nodes, 2) if rng.random() < 0.25
    ]
    rng.shuffle(edges)
    flipped = [(b, a) if rng.random() < 0.5 else (a, b) for a, b in edges]
    assert _tri(spark, flipped) == brute_triangles(edges)


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.graph import bfs_hops  # noqa: E402


def _bfs(spark, edges, sources, k, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {(r.node, r.hops) for r in bfs_hops(e, s, k, **kw).collect()}


def test_bfs_path_graph_hand_distances(spark):
    path = [(i, i + 1) for i in range(5)]  # 0-1-2-3-4-5
    assert _bfs(spark, path, [0], 3) == {(0, 0), (1, 1), (2, 2), (3, 3)}
    # full depth
    assert _bfs(spark, path, [0], 10) == {(i, i) for i in range(6)}


def test_bfs_multi_source_takes_minimum(spark):
    path = [(i, i + 1) for i in range(6)]  # 0..6
    got = _bfs(spark, path, [0, 6], 10)
    assert got == {(0, 0), (6, 0), (1, 1), (5, 1), (2, 2), (4, 2), (3, 3)}


def test_bfs_directed_vs_undirected(spark):
    chain = [(1, 2), (2, 3)]
    assert _bfs(spark, chain, [3], 5, directed=True) == {(3, 0)}
    assert _bfs(spark, chain, [3], 5, directed=False) == {(3, 0), (2, 1), (1, 2)}


def test_bfs_early_stop_and_cycle(spark):
    tri = [(1, 2), (2, 3), (3, 1)]
    # converges in 1 round; loop must early-stop without error at k=10
    assert _bfs(spark, tri, [1], 10) == {(1, 0), (2, 1), (3, 1)}


def test_bfs_zero_hops_and_duplicate_sources(spark):
    assert _bfs(spark, [(1, 2)], [1, 1], 0) == {(1, 0)}


# ---------------------------------------------------------------------------
# sssp_weighted — bounded-round Bellman-Ford (min-plus relaxation).
# The sf0.01 supply graph is additionally value-hash-gated vs unrolled
# full-relaxation CTEs (sssp_supply_graph in test_oracle_parity).
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.graph import sssp_weighted


def _sssp(spark, edges, sources, rounds, **kw):
    e = spark.createDataFrame(edges, "src long, dst long, weight long")
    s = spark.createDataFrame([(x,) for x in sources], "node long")
    return {(r.node, r.dist) for r in sssp_weighted(e, s, rounds, **kw).collect()}


def _brute_sssp(edges, sources, rounds, directed=True):
    """min over paths with <= rounds edges, full relaxation."""
    e = list(edges) + ([] if directed else [(d, s, w) for s, d, w in edges])
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        nxt = dict(dist)
        for s, d, w in e:
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return set(dist.items())


def test_sssp_cheaper_long_path_wins(spark):
    """Direct heavy edge vs 2-hop light path: with 1 round the heavy
    edge is the best ≤1-edge path; with 2 the light path takes over."""
    edges = [(1, 3, 10), (1, 2, 2), (2, 3, 3)]
    assert _sssp(spark, edges, [1], 1, directed=True) == {(1, 0), (2, 2), (3, 10)}
    assert _sssp(spark, edges, [1], 2, directed=True) == {(1, 0), (2, 2), (3, 5)}


def test_sssp_parallel_edges_take_min(spark):
    edges = [(1, 2, 9), (1, 2, 4)]
    assert _sssp(spark, edges, [1], 1, directed=True) == {(1, 0), (2, 4)}


def test_sssp_multi_source_and_undirected(spark):
    edges = [(1, 2, 5), (2, 3, 5), (3, 4, 5)]
    got = _sssp(spark, edges, [1, 4], 3)
    assert got == {(1, 0), (4, 0), (2, 5), (3, 5)}


def test_sssp_early_stop_on_convergence(spark):
    """Triangle converges in 2 rounds; rounds=10 must early-exit with
    the same answer."""
    edges = [(1, 2, 1), (2, 3, 1), (3, 1, 1)]
    assert _sssp(spark, edges, [1], 10, directed=True) == {(1, 0), (2, 1), (3, 2)}


def test_sssp_frontier_equals_full_relaxation(spark):
    """Random-ish graph: the frontier-optimized loop must equal full
    k-round relaxation (the oracle's formulation) for every k."""
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(1, 10))
        for _ in range(40)
    ]
    for rounds in (1, 2, 4):
        assert _sssp(spark, edges, [0], rounds, directed=True) == _brute_sssp(
            edges, [0], rounds
        )


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_sssp_partition_independence(spark):
    edges = [(i, i + 1, (i * 7) % 5 + 1) for i in range(30)]
    e = spark.createDataFrame(edges, "src long, dst long, weight long")
    s = spark.createDataFrame([(0,)], "node long")
    a = sorted(map(tuple, sssp_weighted(e, s, 5).collect()))
    b = sorted(map(tuple, sssp_weighted(e.repartition(11), s, 5).collect()))
    assert a == b


def test_sssp_zero_rounds_and_validation(spark):
    assert _sssp(spark, [(1, 2, 1)], [1], 0) == {(1, 0)}
    e = spark.createDataFrame([(1, 2, 1)], "src long, dst long, weight long")
    s = spark.createDataFrame([(1,)], "node long")
    import pytest as _pt

    with _pt.raises(ValueError):
        sssp_weighted(e, s, -1)


# ---------------------------------------------------------------------------
# ancestor_closure / subtree_rollup — pointer-doubling hierarchy ops.
# The customer binary-tree rollup is value-hash-gated vs a recursive
# CTE (customer_subtree_rollup).
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.graph import (
    ancestor_closure,
    subtree_rollup,
)


def _forest(spark, links):
    return spark.createDataFrame(links, "child long, parent long")


def test_closure_chain_all_ancestors_and_distances(spark):
    # 1 <- 2 <- 3 <- 4 <- 5 (chain of depth 4); levels=2 covers 2^2=4
    links = [(i, i - 1) for i in range(2, 6)]
    got = {
        (r.node, r.anc, r.dist)
        for r in ancestor_closure(_forest(spark, links), 2).collect()
    }
    want = {
        (n, a, n - a) for n in range(2, 6) for a in range(1, n)
    }
    assert got == want


def test_closure_levels_bound_depth(spark):
    """levels=1 covers paths of length <= 2 only."""
    links = [(i, i - 1) for i in range(2, 6)]
    got = {
        (r.node, r.anc)
        for r in ancestor_closure(_forest(spark, links), 1).collect()
    }
    assert got == {(n, a) for n in range(2, 6) for a in range(1, n) if n - a <= 2}


def test_closure_forest_isolation_and_early_exit(spark):
    """Two separate trees never cross; levels far above depth early-exits."""
    links = [(2, 1), (3, 1), (20, 10), (30, 20)]
    got = {
        (r.node, r.anc)
        for r in ancestor_closure(_forest(spark, links), 6).collect()
    }
    assert got == {(2, 1), (3, 1), (20, 10), (30, 20), (30, 10)}


def test_subtree_rollup_hand_tree(spark):
    #        1
    #      2   3
    #    4       (values = id*10)
    nodes = spark.createDataFrame(
        [(1, None, 10), (2, 1, 20), (3, 1, 30), (4, 2, 40)],
        "id long, parent long, v long",
    )
    got = {
        r.ancestor: (r.n_subtree, r.subtree_sum)
        for r in subtree_rollup(nodes, "id", "parent", "v", levels=3).collect()
    }
    assert got == {
        1: (4, 100.0),
        2: (2, 60.0),
        3: (1, 30.0),
        4: (1, 40.0),
    }


# --- kcore ------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.graph import kcore  # noqa: E402


def _kcore_edges(spark):
    # K4 on {1,2,3,4} (a 3-core) + a tail 4-5-6 + pendant 7 off node 1.
    rows = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 6), (1, 7),
    ]
    return spark.createDataFrame(rows, "src bigint, dst bigint")


def brute_kcore(edges, k):
    e = {tuple(sorted(p)) for p in edges}
    while True:
        deg = {}
        for x, y in e:
            deg[x] = deg.get(x, 0) + 1
            deg[y] = deg.get(y, 0) + 1
        keep = {n for n, d in deg.items() if d >= k}
        e2 = {(x, y) for x, y in e if x in keep and y in keep}
        if e2 == e:
            return {n: d for n, d in deg.items() if d >= k}
        e = e2


def test_kcore_matches_brute_force(spark):
    df = _kcore_edges(spark)
    rows = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6), (1, 7)]
    for k in (1, 2, 3, 4):
        got = {r["node"]: r["degree"] for r in kcore(df, "src", "dst", k, rounds=6).collect()}
        assert got == brute_kcore(rows, k), f"k={k}"
    # the 3-core is exactly the K4
    assert set(brute_kcore(rows, 3)) == {1, 2, 3, 4}
    assert brute_kcore(rows, 4) == {}


def test_kcore_extra_round_is_noop(spark):
    df = _kcore_edges(spark)
    a = sorted(map(tuple, kcore(df, "src", "dst", 2, rounds=4).collect()))
    b = sorted(map(tuple, kcore(df, "src", "dst", 2, rounds=5).collect()))
    assert a == b and a  # converged and non-empty


def test_kcore_ignores_duplicates_loops_and_direction(spark):
    rows = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)]
    df = spark.createDataFrame(rows, "src bigint, dst bigint")
    got = {r["node"]: r["degree"] for r in kcore(df, "src", "dst", 2, rounds=3).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


# --- randomized kcore equivalence -------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

edges_st = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)), min_size=0, max_size=40
)


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
@given(edges_st, st.integers(1, 4))
@settings(max_examples=12, deadline=None)
def test_kcore_random_equivalence(spark, edges, k):
    df = (
        spark.createDataFrame(edges, "src bigint, dst bigint")
        if edges
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    got = {
        r["node"]: r["degree"]
        for r in kcore(df, "src", "dst", k, rounds=14).collect()
    }
    want = brute_kcore([e for e in edges if e[0] != e[1]], k) if edges else {}
    assert got == want
