"""Tests for operators/funnel.py — the greedy earliest-completion
automaton vs a driver-side brute force, edge semantics (strict
ordering, within-bounds, same-timestamp ties), and the conversion
report. The exact per-user bound timestamps are additionally
value-hash-checked against the min-chain SQL formulation via the
purchase_funnel contract query (tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.funnel import funnel, funnel_conversion


def _events(spark, rows):
    """rows: (user, us, type) with us in seconds for readability."""
    return spark.createDataFrame(
        [(u, us * 1_000_000, t) for u, us, t in rows],
        "user_id long, us long, event_type string",
    ).select("user_id", F.timestamp_micros("us").alias("ts"), "event_type")


def _brute(rows, steps, within_s=None):
    """Greedy earliest-completion per user, driver-side."""
    by_user = {}
    for u, us, t in rows:
        by_user.setdefault(u, []).append((us, t))
    out = {}
    for u, evs in by_user.items():
        path = []
        for us, t in sorted(evs):
            if len(path) == len(steps):
                break
            if t != steps[len(path)]:
                continue
            if path and not (
                us > path[-1]
                and (within_s is None or us <= path[-1] + within_s)
            ):
                continue
            path.append(us)
        out[u] = path
    return out


STEPS = ("a", "b", "c")


def _check(spark, rows, within_s=None):
    got = {
        r.user_id: [x for x in (r.t1, r.t2, r.t3) if x is not None]
        for r in funnel(
            _events(spark, rows), "user_id", "ts", "event_type", STEPS,
            within_seconds=within_s,
        ).collect()
    }
    want = {
        u: [us * 1_000_000 for us in p]
        for u, p in _brute(rows, STEPS, within_s).items()
    }
    assert got == want


def test_basic_progression(spark):
    _check(spark, [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"),
                   (2, 10, "a"), (2, 20, "c"),        # skips b → stage 1
                   (3, 10, "b"), (3, 20, "c")])       # never starts → stage 0


def test_greedy_binds_earliest(spark):
    """Two 'a' events: the funnel binds the EARLIER one, even though the
    later one would also admit the following 'b'."""
    _check(spark, [(1, 5, "a"), (1, 8, "a"), (1, 9, "b"), (1, 12, "c")])


def test_strictly_increasing_rejects_ties(spark):
    """A 'b' at exactly the bound 'a' timestamp does not advance the
    funnel (strict >), matching the min-chain SQL on both engines."""
    rows = [(1, 10, "a"), (1, 10, "b"), (1, 20, "b"), (1, 30, "c")]
    out = funnel(
        _events(spark, rows), "user_id", "ts", "event_type", STEPS
    ).collect()[0]
    assert out.t2 == 20 * 1_000_000
    _check(spark, rows)


def test_within_bound_blocks_and_admits(spark):
    rows = [(1, 0, "a"), (1, 100, "b"), (1, 150, "c"),
            (2, 0, "a"), (2, 100, "b"), (2, 300, "c")]  # c too late for user 2
    _check(spark, rows, within_s=120)
    out = {
        r.user_id: r.stage
        for r in funnel(
            _events(spark, rows), "user_id", "ts", "event_type", STEPS,
            within_seconds=120,
        ).collect()
    }
    assert out == {1: 3, 2: 2}


def test_greedy_within_can_lose_to_patient(spark):
    """Greedy semantics pinned: binding the earliest 'b' can kill a
    funnel a later 'b' would have completed — that's the defined
    behavior, same as the SQL min-chain."""
    rows = [(1, 0, "a"), (1, 10, "b"), (1, 200, "b"), (1, 250, "c")]
    out = funnel(
        _events(spark, rows), "user_id", "ts", "event_type", STEPS,
        within_seconds=120,
    ).collect()[0]
    assert out.stage == 2 and out.t2 == 10 * 1_000_000
    _check(spark, rows, within_s=120)


def test_repeated_step_types(spark):
    """Steps may repeat ('a','a'): two distinct strictly-increasing
    events of the same type are required."""
    rows = [(1, 10, "a"), (1, 20, "a"), (2, 10, "a")]
    out = {
        r.user_id: r.stage
        for r in funnel(
            _events(spark, rows), "user_id", "ts", "event_type", ("a", "a")
        ).collect()
    }
    assert out == {1: 2, 2: 1}


def test_partition_independence(spark):
    rows = [(u, s, t) for u in range(20)
            for s, t in [(u, "a"), (u + 50, "b"), (u + 90, "c")]]
    df = _events(spark, rows)
    a = sorted(map(tuple, funnel(df, "user_id", "ts", "event_type", STEPS).collect()))
    b = sorted(map(tuple, funnel(
        df.repartition(13), "user_id", "ts", "event_type", STEPS
    ).collect()))
    assert a == b


def test_funnel_validation(spark):
    df = _events(spark, [(1, 1, "a")])
    with pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", ())
    with pytest.raises(ValueError):
        funnel(df, "user_id", "ts", "event_type", STEPS, within_seconds=0)


def test_funnel_single_shuffle_plan(spark):
    """The automaton costs exactly one Exchange (the user-key shuffle).
    A join-chain formulation would show k of them."""
    df = _events(spark, [(1, 10, "a"), (1, 20, "b"), (1, 30, "c")])
    plan = funnel(
        df, "user_id", "ts", "event_type", STEPS
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_funnel_conversion_report(spark):
    rows = ([(u, 10, "a") for u in range(10)]
            + [(u, 20, "b") for u in range(6)]
            + [(u, 30, "c") for u in range(2)]
            + [(99, 5, "x")])
    rep = funnel_conversion(
        funnel(_events(spark, rows), "user_id", "ts", "event_type", STEPS)
    ).collect()
    at_least = {r.stage: r.n_at_least for r in rep}
    assert at_least == {0: 11, 1: 10, 2: 6, 3: 2}
    conv = {r.stage: r.conversion for r in rep}
    assert conv[0] is None
    assert conv[2] == pytest.approx(0.6)
    assert conv[3] == pytest.approx(2 / 6)
