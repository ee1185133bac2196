"""Gaps-and-islands property tests: the Spark pipeline vs a brute-force
interval merge (the oracle queries already pin exact SQL parity; this
pins the *semantics* against an independent implementation)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hpc_hd_textreuse_etl_spark.functions.intervals import coverage, merge_intervals


def brute_force_merge(intervals, gap):
    """Independent merge: sort, sweep, join when prev_end + gap >= start."""
    out = []
    for s, e in sorted(intervals):
        if out and out[-1][1] + gap >= s:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


intervals_strategy = st.lists(
    st.tuples(st.integers(0, 500), st.integers(1, 120)), min_size=1, max_size=40
)


@given(st.lists(intervals_strategy, min_size=1, max_size=4), st.integers(0, 5))
@settings(max_examples=60, deadline=None)
def test_merge_intervals_matches_brute_force(spark, groups, gap):
    rows = [
        (g, s, s + ln)
        for g, ivs in enumerate(groups)
        for s, ln in ivs
    ]
    df = spark.createDataFrame(rows, "g int, s int, e int")
    got = {}
    for r in merge_intervals(df, ["g"], "s", "e", adjacency_gap=gap).collect():
        got.setdefault(r.g, []).append((r.island_start, r.island_end))
    for g, ivs in enumerate(groups):
        expected = brute_force_merge([(s, s + ln) for s, ln in ivs], gap)
        assert sorted(got[g]) == expected, f"group {g} gap {gap}"


def test_coverage_totals(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 5, 15), (1, 16, 20), (1, 100, 110)], "g int, s int, e int"
    )
    row = coverage(df, ["g"], "s", "e", adjacency_gap=1).first()
    # [0,15]+[16,20] merge (adjacent via gap=1) → [0,20]; plus [100,110]
    assert row.covered_len == 30 and row.n_islands == 2 and row.n_intervals == 4
