"""Tests for operators/spatial.py — grid-blocking completeness and
exactly-once emission vs brute force, boundary semantics, plan shape.
The full pair set over hash-placed customers is additionally
value-hash-checked against a DuckDB θ-join brute force via
customer_radius_pairs (test_oracle_parity)."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.spatial import (
    radius_join,
    radius_self_join,
)


def _pts(spark, pts):
    return spark.createDataFrame(
        [(i, x, y) for i, (x, y) in enumerate(pts)],
        "id long, x long, y long",
    )


def _brute_self(pts, r):
    out = set()
    for (ia, (xa, ya)), (ib, (xb, yb)) in itertools.combinations(
        enumerate(pts), 2
    ):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= r * r:
            out.add((ia, ib, d2))
    return out


def _run_self(spark, pts, r):
    rows = radius_self_join(_pts(spark, pts), "id", r).collect()
    return {(r_.id_a, r_.id_b, r_.dist_sq) for r_ in rows}


def test_hand_pairs_inclusive_boundary(spark):
    """Distance exactly r is included (3-4-5 triangle at r=5)."""
    pts = [(0, 0), (3, 4), (100, 100)]
    assert _run_self(spark, pts, 5) == {(0, 1, 25)}
    assert _run_self(spark, pts, 4) == set()


def test_cross_cell_pairs_found(spark):
    """Points straddling a cell boundary (cells differ in both axes)
    must still pair — the 3x3 replication at work."""
    r = 10
    pts = [(9, 9), (11, 11), (9, 11), (11, 9)]  # around the (10,10) corner
    got = _run_self(spark, pts, r)
    assert {(a, b) for a, b, _ in got} == {
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)
    }


def test_randomized_brute_force_equivalence(spark):
    rng = random.Random(5)
    pts = [(rng.randrange(0, 200), rng.randrange(0, 200)) for _ in range(120)]
    for r in (7, 25, 60):
        assert _run_self(spark, pts, r) == _brute_self(pts, r)


def test_negative_coordinates(spark):
    """floor-division cells (not truncation) — pairs across the origin
    must behave like anywhere else."""
    pts = [(-3, -3), (2, 2), (-8, 4), (-100, -100)]
    for r in (8, 15):
        assert _run_self(spark, pts, r) == _brute_self(pts, r)


def test_two_table_exactly_once(spark):
    """Left-right join: every qualifying pair appears exactly once even
    when both points share a home cell (no distinct in the plan)."""
    left = _pts(spark, [(0, 0), (5, 5)])
    right = spark.createDataFrame(
        [(10, 1, 1), (11, 300, 300)], "id long, x long, y long"
    )
    rows = radius_join(left, right, "id", "id", 10).collect()
    got = [(r.id_a, r.id_b) for r in rows]
    assert sorted(got) == [(0, 10), (1, 10)]  # once each, no dup from 3x3


def test_coincident_points(spark):
    pts = [(7, 7), (7, 7), (7, 7)]
    assert _run_self(spark, pts, 1) == {(0, 1, 0), (0, 2, 0), (1, 2, 0)}


def test_no_cartesian_and_validation(spark):
    df = _pts(spark, [(0, 0), (1, 1)])
    plan = radius_self_join(df, "id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    with pytest.raises(ValueError):
        radius_self_join(df, "id", 0)
