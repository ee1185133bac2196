"""Skyline / Pareto frontier (operators/skyline.py) — brute-force
equivalence, duplicate handling, direction handling, and plan shape.
The contract queries (pareto_frontier_parts / pareto_frontier_2d_parts)
additionally value-hash the full frontier vs DuckDB's NOT EXISTS oracle
(tests/test_oracle_parity.py)."""

from __future__ import annotations

import itertools
import random

import pytest

from hpc_hd_textreuse_etl_spark.operators.skyline import (
    pareto_frontier,
    pareto_frontier_2d,
)


def _brute_skyline(rows, dims, directions):
    """Reference O(n^2) skyline over tuples (id, *dims)."""

    def oriented(r):
        return tuple(
            -r[1 + j] if directions[j] == "max" else r[1 + j]
            for j in range(len(dims))
        )

    out = []
    for q in rows:
        oq = oriented(q)
        dominated = False
        for p in rows:
            op = oriented(p)
            if all(a <= b for a, b in zip(op, oq)) and any(
                a < b for a, b in zip(op, oq)
            ):
                dominated = True
                break
        if not dominated:
            out.append(q)
    return sorted(out)


def _df(spark, rows, ncols):
    cols = ", ".join(f"d{j} double" for j in range(ncols))
    return spark.createDataFrame(rows, f"id long, {cols}")


@pytest.mark.parametrize("ndims", [2, 3, 4])
def test_brute_force_equivalence(spark, ndims):
    rng = random.Random(42 + ndims)
    rows = [
        tuple([i] + [float(rng.randint(0, 8)) for _ in range(ndims)])
        for i in range(200)
    ]
    dims = [f"d{j}" for j in range(ndims)]
    for directions in [["min"] * ndims, ["max"] + ["min"] * (ndims - 1)]:
        got = sorted(
            tuple(r)
            for r in pareto_frontier(
                _df(spark, rows, ndims), dims, directions
            ).collect()
        )
        assert got == _brute_skyline(rows, dims, directions)


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
def test_2d_matches_general(spark):
    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 30)), float(rng.randint(0, 30)))
        for i in range(500)
    ]
    df = _df(spark, rows, 2)
    for directions in itertools.product(("min", "max"), repeat=2):
        a = sorted(
            tuple(r)
            for r in pareto_frontier_2d(df, "d0", "d1", directions).collect()
        )
        b = sorted(
            tuple(r)
            for r in pareto_frontier(df, ["d0", "d1"], list(directions)).collect()
        )
        assert a == b, directions


def test_duplicates_all_kept(spark):
    # two copies of the single best point: neither dominates the other
    rows = [(1, 0.0, 0.0), (2, 0.0, 0.0), (3, 1.0, 1.0)]
    got = sorted(r["id"] for r in pareto_frontier(
        _df(spark, rows, 2), ["d0", "d1"], ["min", "min"]
    ).collect())
    assert got == [1, 2]
    got2d = sorted(r["id"] for r in pareto_frontier_2d(
        _df(spark, rows, 2), "d0", "d1", ("min", "min")
    ).collect())
    assert got2d == [1, 2]


def test_single_dominator(spark):
    rows = [(1, 0.0, 0.0), (2, 0.0, 1.0), (3, 1.0, 0.0)]
    got = sorted(r["id"] for r in pareto_frontier(
        _df(spark, rows, 2), ["d0", "d1"], ["min", "min"]
    ).collect())
    assert got == [1]


def test_validation():
    with pytest.raises(ValueError):
        pareto_frontier_2d(None, "a", "b", ("min", "up"))
    with pytest.raises(ValueError):
        pareto_frontier(None, ["a"], ["min", "min"])


def test_partition_independence(spark):
    rng = random.Random(3)
    rows = [
        (i, float(rng.randint(0, 10)), float(rng.randint(0, 10)), float(rng.randint(0, 10)))
        for i in range(300)
    ]
    df = _df(spark, rows, 3)
    dims, dirs = ["d0", "d1", "d2"], ["min", "max", "min"]
    base = sorted(tuple(r) for r in pareto_frontier(df, dims, dirs).collect())
    for n in (1, 7):
        got = sorted(
            tuple(r)
            for r in pareto_frontier(df.repartition(n), dims, dirs).collect()
        )
        assert got == base


def test_2d_plan_no_global_window_on_data(spark):
    """The prefix-min window must run on the per-group aggregate (small)
    — the input reaches the result only through the broadcast semi-join,
    never through a single-partition sort of all rows."""
    rng = random.Random(5)
    rows = [(i, float(rng.randint(0, 20)), float(rng.random())) for i in range(100)]
    df = _df(spark, rows, 2)
    plan = (
        pareto_frontier_2d(df, "d0", "d1", ("min", "min"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the window sits above a HashAggregate, not above the raw scan
    assert plan.index("Window") > plan.index("BroadcastHashJoin")


def test_anticorrelated_contraction_fallback(spark):
    """Worst case — every point is on the frontier (anti-diagonal), so
    phase 1 can't shrink anything. With a tiny broadcast budget the
    operator must contract partitions instead of broadcasting 400
    candidates, bottom out at one partition, and still be exact."""
    n = 400
    rows = [(i, float(i), float(n - i)) for i in range(n)]
    rows += [(n, 0.0, float(n)), (n + 1, 0.0, float(n))]  # dup frontier pt
    df = _df(spark, rows, 2).repartition(32)
    got = sorted(
        tuple(r)
        for r in pareto_frontier(
            df, ["d0", "d1"], ["min", "min"], max_broadcast_candidates=50
        ).collect()
    )
    assert got == _brute_skyline(rows, ["d0", "d1"], ["min", "min"])


def test_budget_exhausted_raises_instead_of_broadcasting(spark):
    """Contraction budget exhausted with the candidate set still over
    the broadcast cap: the operator must refuse loudly (ValueError),
    not broadcast an oversized set — the round-5 guard at
    skyline.py:164-176."""
    n = 200  # anti-diagonal: every point survives every local prune
    rows = [(i, float(i), float(n - i)) for i in range(n)]
    df = _df(spark, rows, 2).repartition(16)
    with pytest.raises(ValueError, match="contractions"):
        pareto_frontier(
            df,
            ["d0", "d1"],
            ["min", "min"],
            max_broadcast_candidates=10,
            max_contractions=0,
        )
    # one contraction (16 → 2 partitions) still can't shrink the
    # anti-diagonal below the cap and doesn't bottom out at a single
    # partition — must raise rather than fall through
    with pytest.raises(ValueError, match="contractions"):
        pareto_frontier(
            df,
            ["d0", "d1"],
            ["min", "min"],
            max_broadcast_candidates=10,
            max_contractions=1,
        )


def test_contraction_matches_default_path(spark):
    """Mixed data: forcing contraction must not change the answer vs the
    ordinary broadcast-verify path."""
    rng = random.Random(11)
    rows = [
        (i, float(rng.randint(0, 12)), float(rng.randint(0, 12)), float(rng.randint(0, 12)))
        for i in range(300)
    ]
    df = _df(spark, rows, 3).repartition(16)
    dims, dirs = ["d0", "d1", "d2"], ["min", "max", "min"]
    base = sorted(tuple(r) for r in pareto_frontier(df, dims, dirs).collect())
    forced = sorted(
        tuple(r)
        for r in pareto_frontier(
            df, dims, dirs, max_broadcast_candidates=1
        ).collect()
    )
    assert forced == base
