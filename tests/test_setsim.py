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


# --- containment_threshold_pairs --------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.setsim import (  # noqa: E402
    containment_threshold_pairs,
)


def brute_containment(sets, t_milli):
    out = set()
    for a, ea in sets.items():
        for b, eb in sets.items():
            if a != b and eb and 1000 * len(ea & eb) >= t_milli * len(eb):
                out.add((a, b, len(ea & eb), len(eb)))
    return out


def test_containment_hand_case(spark):
    rows = [
        (1, ["x", "y", "z", "w", "q"]),   # container
        (2, ["x", "y"]),                  # fully inside 1
        (3, ["x", "r"]),                  # half inside 1
        (4, ["p"]),                       # disjoint
    ]
    df = spark.createDataFrame(rows, "id int, els array<string>")
    got = {
        (r["container_id"], r["contained_id"], r["n_intersect"], r["n_contained"])
        for r in containment_threshold_pairs(df, "id", F.col("els"), 0.9).collect()
    }
    assert (1, 2, 2, 2) in got
    assert all(p[1] != 3 for p in got)  # 50% < 90%: 3 is contained nowhere
    # asymmetry: 2 contains only 2/5 of 1's elements
    assert all(not (p[0] == 2 and p[1] == 1) for p in got)


contain_sets_st = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8),
    min_size=0,
    max_size=10,
)


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
@given(contain_sets_st, st.sampled_from([300, 500, 800, 1000]))
@settings(max_examples=15, deadline=None)
def test_containment_random_equivalence(spark, els, t_milli):
    sets = {i: set(e) for i, e in enumerate(els) if e}
    rows = [(i, sorted(s)) for i, s in sets.items()]
    df = (
        spark.createDataFrame(rows, "id int, els array<string>")
        if rows
        else spark.createDataFrame([], "id int, els array<string>")
    )
    got = {
        (r["container_id"], r["contained_id"], r["n_intersect"], r["n_contained"])
        for r in containment_threshold_pairs(
            df, "id", F.col("els"), t_milli / 1000
        ).collect()
    }
    assert got == brute_containment(sets, t_milli)


def test_containment_no_cartesian(spark):
    rows = [(i, [f"t{i}", f"t{i+1}", "common"]) for i in range(30)]
    df = spark.createDataFrame(rows, "id int, els array<string>")
    plan = (
        containment_threshold_pairs(df, "id", F.col("els"), 0.8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
