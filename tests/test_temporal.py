"""As-of join property tests: the single-shuffle union+window plan vs a
brute-force per-row scan, across directions, ties, tolerance and NULLs."""

from __future__ import annotations

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.temporal import asof_join


def brute_force_asof(lefts, rights, direction, tolerance=None):
    """lefts: [(key, t, lid)]; rights: [(key, t, v)] → {lid: v|None}.
    Tie-break among equal right times: max (t, v) struct, i.e. max v."""
    out = {}
    for k, lt, lid in lefts:
        if lt is None:
            out[lid] = None
            continue
        if direction == "backward":
            cands = [(rt, v) for rk, rt, v in rights if rk == k and rt is not None and rt <= lt]
            best = max(cands) if cands else None
            dist = lt - best[0] if best else None
        else:
            cands = [(rt, v) for rk, rt, v in rights if rk == k and rt is not None and rt >= lt]
            best = min(cands) if cands else None
            # nearest-future tie-break: max v among the minimal rt
            if cands:
                rt0 = min(rt for rt, _ in cands)
                best = (rt0, max(v for rt, v in cands if rt == rt0))
                dist = rt0 - lt
        if best is None or (tolerance is not None and dist > tolerance):
            out[lid] = None
        else:
            out[lid] = best[1]
    return out


lefts_st = st.lists(
    st.tuples(st.integers(0, 2), st.one_of(st.none(), st.integers(0, 50))),
    min_size=1,
    max_size=25,
)
rights_st = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(0, 5)),
    min_size=0,
    max_size=25,
)


@given(lefts_st, rights_st, st.sampled_from(["backward", "forward"]),
       st.one_of(st.none(), st.integers(0, 10)))
@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
@settings(max_examples=40, deadline=None)
def test_asof_matches_brute_force(spark, lefts, rights, direction, tolerance):
    lrows = [(k, t, i) for i, (k, t) in enumerate(lefts)]
    ldf = spark.createDataFrame(lrows, "k int, t int, lid int")
    rdf = spark.createDataFrame(rights, "k int, t int, v int") if rights else \
        spark.createDataFrame([], "k int, t int, v int")
    tol = F.lit(tolerance) if tolerance is not None else None
    got = asof_join(ldf, rdf, "t", "t", by=["k"], right_cols=["v"],
                    direction=direction, tolerance=tol, suffix="_m")
    got_map = {r.lid: r.v_m for r in got.collect()}
    want = brute_force_asof(lrows, rights, direction, tolerance)
    assert got_map == want
    assert len(got_map) == len(lrows)  # every left row survives exactly once


def test_asof_timestamps_with_interval_tolerance(spark):
    ldf = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-03-01"), (2, "2024-01-05")], "k int, d string"
    ).select("k", F.col("d").cast("timestamp").alias("t"))
    rdf = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-02-28", 20.0), (2, "2023-06-01", 5.0)],
        "k int, d string, v double",
    ).select("k", F.col("d").cast("timestamp").alias("t"), "v")
    got = asof_join(
        ldf, rdf, "t", "t", by=["k"], right_cols=["v"],
        tolerance=F.expr("INTERVAL 30 DAYS"), suffix="_m",
    )
    rows = {(r.k, str(r.t)[:10]): r.v_m for r in got.collect()}
    assert rows[(1, "2024-01-10")] == 10.0
    assert rows[(1, "2024-03-01")] == 20.0
    assert rows[(2, "2024-01-05")] is None  # match exists but outside tolerance


def test_asof_inclusive_tie_and_collision_guard(spark):
    ldf = spark.createDataFrame([(1, 5, 99)], "k int, t int, v int")
    rdf = spark.createDataFrame([(1, 5, 7), (1, 5, 9)], "k int, t int, v int")
    got = asof_join(ldf, rdf, "t", "t", by=["k"], right_cols=["v"], suffix="_m")
    assert got.collect()[0].v_m == 9  # equal time matches; max payload wins
    try:
        asof_join(ldf, rdf, "t", "t", by=["k"], right_cols=["v"])
        raise AssertionError("expected collision error")
    except ValueError as e:
        assert "collide" in str(e)


def test_asof_plan_is_single_exchange(spark):
    """The whole as-of is one shuffle (the window partitioning) — no join
    node, no cartesian range expansion."""
    ldf = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("t"), F.col("id").alias("lid")
    )
    rdf = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("t"), F.col("id").alias("v")
    )
    plan = asof_join(ldf, rdf, "t", "t", by=["k"], right_cols=["v"], suffix="_m") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# interval_join (binned range join)
# ---------------------------------------------------------------------------

from pyspark.sql import Row  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.temporal import interval_join  # noqa: E402


def brute_force_overlaps(lefts, rights, keyed=True):
    """[(key, id, s, e)] × 2 → {(lid, rid)} for overlapping half-open pairs."""
    out = set()
    for lk, lid, ls, le in lefts:
        for rk, rid, rs, re_ in rights:
            if (not keyed or lk == rk) and ls < re_ and rs < le:
                out.add((lid, rid))
    return out


iv_st = st.lists(
    st.tuples(
        st.integers(0, 2),          # key
        st.integers(-50, 200),      # start
        st.integers(1, 120),        # length (spans many width-7 bins)
    ),
    min_size=0,
    max_size=25,
)


@pytest.mark.slow  # soak tier, default-off (round-12 verify-window fix; run with -m slow)
@given(iv_st, iv_st, st.sampled_from([3, 7, 64]))
@settings(max_examples=25, deadline=None)
def test_interval_join_matches_brute_force(spark, livs, rivs, width):
    lefts = [(k, i, s, s + n) for i, (k, s, n) in enumerate(livs)]
    rights = [(k, 1000 + i, s, s + n) for i, (k, s, n) in enumerate(rivs)]
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        [Row(key=k, rid=i, s=s, e=e) for k, i, s, e in rows],
        "key long, rid long, s long, e long",
    )
    got = interval_join(
        mk(lefts), mk(rights), "s", "e", "s", "e", by=["key"], bin_width=width
    )
    pairs = {(r.rid_l, r.rid_r) for r in got.collect()}
    assert pairs == brute_force_overlaps(lefts, rights)
    # exactly-once: no duplicate pair rows even when pairs share many bins
    assert got.count() == len(pairs)


def test_interval_join_plan_is_equi_join(spark):
    iv = spark.createDataFrame(
        [Row(key=1, rid=i, s=i * 10, e=i * 10 + 25) for i in range(50)],
        "key long, rid long, s long, e long",
    )
    plan = interval_join(
        iv, iv, "s", "e", "s", "e", by=["key"], bin_width=16
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_fanout_guard_raises(spark):
    import pytest as _pytest

    wide = spark.createDataFrame(
        [Row(key=1, rid=1, s=0, e=10_000_000)], "key long, rid long, s long, e long"
    )
    bad = interval_join(
        wide, wide, "s", "e", "s", "e", by=["key"], bin_width=10, max_bins_per_row=64
    )
    with _pytest.raises(Exception, match="interval_join"):
        bad.count()


def test_interval_join_no_keys_and_boundary_touch(spark):
    a = spark.createDataFrame(
        [Row(rid=1, s=0, e=10), Row(rid=2, s=10, e=20)], "rid long, s long, e long"
    )
    got = interval_join(a, a, "s", "e", "s", "e", bin_width=10)
    pairs = {(r.rid_l, r.rid_r) for r in got.collect()}
    # half-open: [0,10) and [10,20) touch but do NOT overlap
    assert pairs == {(1, 1), (2, 2)}


# --- decayed_sum ------------------------------------------------------------

from datetime import datetime  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.temporal import decayed_sum  # noqa: E402


def _decay_rows(spark):
    rows = [
        # key, ts, value
        (1, datetime(2020, 1, 1), 100.0),   # 0 half-lives before as_of? see ages
        (1, datetime(2019, 1, 1), 100.0),
        (1, datetime(2016, 1, 1), 100.0),
        (2, datetime(2020, 6, 1), 50.25),
        (2, datetime(1990, 1, 1), 1000.0),  # far past the clamp
    ]
    return spark.createDataFrame(rows, "k int, ts timestamp, v double")


def test_decayed_sum_exact_weights(spark):
    # as_of 2020-06-01, half-life 365 days:
    #   (1, 2020-01-01): 152 days  -> d=0, w=1
    #   (1, 2019-01-01): 517 days  -> d=1, w=1/2
    #   (1, 2016-01-01): 1613 days -> d=4, w=1/16
    #   (2, 2020-06-01): 0 days    -> d=0, w=1
    #   (2, 1990-01-01): clamped   -> d=20, w=2^-20
    out = decayed_sum(
        _decay_rows(spark), ["k"], "v", "ts",
        as_of="2020-06-01 00:00:00", half_life="365 days",
    )
    got = {r["k"]: r for r in out.collect()}
    assert got[1]["decayed_value"] == 100.0 + 50.0 + 6.25
    assert got[1]["decayed_value_n"] == 3
    assert got[2]["decayed_value"] == 50.25 + 1000.0 / (1 << 20)
    # scaled accumulator is cents * 2^20 exactly
    assert got[2]["decayed_value_scaled"] == 5025 * (1 << 20) + 100000
    assert got[2]["decayed_value_n"] == 2


def test_decayed_sum_future_rows_full_weight(spark):
    out = decayed_sum(
        _decay_rows(spark), ["k"], "v", "ts",
        as_of="2000-01-01 00:00:00", half_life="365 days",
    )
    got = {r["k"]: r["decayed_value"] for r in out.collect()}
    # every ts except 1990 is in the future -> d clamps to 0 -> full weight
    assert got[1] == 300.0
    # 2000-01-01 - 1990-01-01 = 3652 days -> d = floor(3652/365) = 10
    assert got[2] == 50.25 + 1000.0 / (1 << 10)


def test_decayed_sum_partition_independent(spark):
    df = _decay_rows(spark)
    a = sorted(map(tuple, decayed_sum(df, ["k"], "v", "ts", "2020-06-01 00:00:00").collect()))
    b = sorted(map(tuple, decayed_sum(df.repartition(5), ["k"], "v", "ts", "2020-06-01 00:00:00").collect()))
    assert a == b


# --- sliding_distinct_count -------------------------------------------------

from hpc_hd_textreuse_etl_spark.operators.temporal import (  # noqa: E402
    sliding_distinct_count,
)


def test_sliding_distinct_count_hand_case(spark):
    rows = [
        # user, ts — u1 active d1 and d3; u2 active d1 twice (dedup); u3 d9
        (1, datetime(2024, 1, 1, 5)),
        (1, datetime(2024, 1, 3, 6)),
        (2, datetime(2024, 1, 1, 7)),
        (2, datetime(2024, 1, 1, 8)),
        (3, datetime(2024, 1, 9, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        str(r["report_day"]): r["active_entities"]
        for r in sliding_distinct_count(df, "ts", "user_id", 7).collect()
    }
    # span clips to [2024-01-01, 2024-01-09]
    assert out["2024-01-01"] == 2          # u1, u2
    assert out["2024-01-03"] == 2          # u1 (d1+d3), u2 (d1)
    assert out["2024-01-07"] == 2          # d1 activity still in window (d1+6)
    assert out["2024-01-08"] == 1          # only u1's d3 remains
    assert out["2024-01-09"] == 2          # u1 (d3) + u3 (d9)
    assert "2024-01-10" not in out         # beyond max observed day


def test_sliding_distinct_window_one_is_dau(spark):
    rows = [(1, datetime(2024, 1, 1)), (2, datetime(2024, 1, 1)), (1, datetime(2024, 1, 2))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        str(r["report_day"]): r["active_entities"]
        for r in sliding_distinct_count(df, "ts", "user_id", 1).collect()
    }
    assert out == {"2024-01-01": 2, "2024-01-02": 1}


def test_sliding_distinct_no_nested_loop(spark):
    rows = [(1, datetime(2024, 1, 1))]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    plan = (
        sliding_distinct_count(df, "ts", "user_id", 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    # only the broadcast of the 1-row span aggregate may nested-loop
    assert plan.count("BroadcastNestedLoopJoin") <= 1


# --- randomized decayed_sum equivalence -------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

decay_rows_st = st.lists(
    st.tuples(
        st.integers(0, 3),                    # key
        st.integers(0, 4000),                 # days since 2010-01-01
        st.integers(0, 10_000_00),            # value in cents
    ),
    min_size=1,
    max_size=30,
)


@given(decay_rows_st)
@settings(max_examples=15, deadline=None)
def test_decayed_sum_random_equivalence(spark, rows):
    base = datetime(2010, 1, 1)
    as_of = datetime(2021, 1, 1)
    data = [
        (k, base + __import__("datetime").timedelta(days=d), cents / 100.0)
        for k, d, cents in rows
    ]
    df = spark.createDataFrame(data, "k int, ts timestamp, v double")
    got = {
        r["k"]: (r["decayed_value_scaled"], r["decayed_value"])
        for r in decayed_sum(
            df, ["k"], "v", "ts", "2021-01-01 00:00:00", "365 days"
        ).collect()
    }
    want = {}
    for k, d, cents in rows:
        age_days = (as_of - base).days - d
        hl = max(0, min(20, age_days * 86_400_000_000 // (365 * 86_400_000_000)))
        want[k] = want.get(k, 0) + cents * (1 << (20 - hl))
    assert {k: v[0] for k, v in got.items()} == want
    for k, (scaled, dbl) in got.items():
        assert dbl == scaled / float(100 * (1 << 20))


import pytest  # noqa: E402

from hpc_hd_textreuse_etl_spark.operators.temporal import (  # noqa: E402
    gapfill_buckets,
)


def _gapfill_input(spark):
    return spark.createDataFrame(
        [
            ("a", datetime(2021, 1, 1), 1.0),
            ("a", datetime(2021, 1, 4), 2.0),
            ("b", datetime(2021, 1, 2), 3.0),
        ],
        "g string, bucket timestamp, v double",
    )


def test_gapfill_fills_missing_buckets(spark):
    out = gapfill_buckets(
        _gapfill_input(spark),
        "bucket",
        ["g"],
        {"total": F.sum("v")},
        step="interval 1 day",
        fill={"total": 0.0},
    ).collect()
    # 4-day span × 2 groups = 8 dense cells
    assert len(out) == 8
    cells = {(r["g"], r["bucket"].day): r["total"] for r in out}
    assert cells[("a", 1)] == 1.0 and cells[("a", 4)] == 2.0
    assert cells[("a", 2)] == 0.0 and cells[("b", 3)] == 0.0


def test_gapfill_refuses_oversized_grid(spark):
    df = _gapfill_input(spark)
    with pytest.raises(ValueError, match="allow_dense_grid"):
        gapfill_buckets(
            df,
            "bucket",
            ["g"],
            {"total": F.sum("v")},
            step="interval 1 second",  # ~260k buckets × 2 groups
            max_grid_cells=1000,
        )
    # explicit opt-in skips the guard (and its probe scan) entirely
    out = gapfill_buckets(
        df,
        "bucket",
        ["g"],
        {"total": F.sum("v")},
        step="interval 1 day",
        max_grid_cells=1,
        allow_dense_grid=True,
    )
    assert out.count() == 8


def test_gapfill_guard_handles_empty_and_bad_step(spark):
    empty = _gapfill_input(spark).where(F.lit(False))
    assert (
        gapfill_buckets(
            empty, "bucket", ["g"], {"total": F.sum("v")}, max_grid_cells=10
        ).count()
        == 0
    )
    with pytest.raises(ValueError, match="interval literal"):
        gapfill_buckets(
            _gapfill_input(spark),
            "bucket",
            ["g"],
            {"total": F.sum("v")},
            step="interval -1 day",
        )


@pytest.mark.parametrize("allow_dense", [False, True])
def test_gapfill_step_validated_in_both_modes(spark, allow_dense):
    """The step gate must run even under allow_dense_grid=True: the
    string is interpolated into SQL, so injection/typos and negative
    or zero widths are refused before any plan is built."""
    df = _gapfill_input(spark)

    def call(step):
        return gapfill_buckets(
            df,
            "bucket",
            ["g"],
            {"total": F.sum("v")},
            step=step,
            allow_dense_grid=allow_dense,
        )

    for bad in (
        "interval -1 day",            # negative
        "1 day",                      # missing keyword
        "interval 1 fortnight",       # unknown unit
        "interval 1 day); DROP --",   # injection shape
        "interval '1' day",           # quoted form not in the strict gate
    ):
        with pytest.raises(ValueError, match="interval literal"):
            call(bad)
    with pytest.raises(ValueError, match="positive"):
        call("interval 0 days")
    # well-formed multi-term literal passes in both modes
    assert call("interval 1 day 0 hours").count() == 8


def test_gapfill_subsecond_steps_accepted(spark):
    """millisecond/microsecond are valid ANSI interval units and were
    valid before the r6 injection gate — the gate must not reject them
    (ADVICE r6). 500ms over a 7-day extent would blow the grid guard,
    so probe the validator directly for width, then run a real
    sub-second fill on a narrow extent."""
    from hpc_hd_textreuse_etl_spark.operators.temporal import (
        _validated_step_micros,
    )

    df = _gapfill_input(spark)
    assert _validated_step_micros(df, "interval 500 milliseconds") == 500_000
    assert _validated_step_micros(df, "interval 250 microseconds") == 250
    narrow = spark.createDataFrame(
        [("g1", "2024-01-01 00:00:00.0", 1), ("g1", "2024-01-01 00:00:02.0", 2)],
        "g string, bucket string, v int",
    ).select("g", F.col("bucket").cast("timestamp").alias("bucket"), "v")
    out = gapfill_buckets(
        narrow, "bucket", ["g"], {"total": F.sum("v")},
        step="interval 500 milliseconds",
    )
    assert out.count() == 5  # 0.0 .. 2.0 inclusive at 500ms


def test_sliding_distinct_matches_count_distinct_spelling(spark):
    """Round 11: the interval-union rewrite (one corpus shuffle, SUM of
    exactly-once day emissions) must be row-identical to the original
    dedup -> explode -> COUNT(DISTINCT) spelling, including the NULL
    corners: NULL timestamps vanish, NULL entities extend the observed
    day span and surface covered days with count 0."""
    import random

    from datetime import datetime as dt

    rng = random.Random(1107)
    rows = []
    for _ in range(400):
        ent = rng.choice([None, 1, 2, 3, 4, 5, 6, 7])
        day = rng.randrange(1, 28)
        ts = None if rng.random() < 0.05 else dt(2024, rng.choice([1, 2]), day, rng.randrange(24))
        rows.append((ent, ts))
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    for w in (1, 3, 7):
        new = {
            (str(r["report_day"]), r["active_entities"])
            for r in sliding_distinct_count(df, "ts", "user_id", w).collect()
        }
        ud = df.select(
            F.col("user_id").alias("e"),
            F.date_trunc("day", F.col("ts")).cast("date").alias("d"),
        ).distinct()
        span = ud.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
        old = {
            (str(r["report_day"]), r["n"])
            for r in ud.select(
                "e",
                F.explode(
                    F.sequence(F.col("d"), F.date_add(F.col("d"), w - 1))
                ).alias("report_day"),
            )
            .crossJoin(F.broadcast(span))
            .where(F.col("report_day").between(F.col("lo"), F.col("hi")))
            .groupBy("report_day")
            .agg(F.count_distinct("e").cast("bigint").alias("n"))
            .collect()
        }
        assert new == old, f"window={w}"


def test_sliding_distinct_single_corpus_exchange(spark):
    """Plan pin for the rewrite: exactly one hashpartitioning exchange
    (the per-entity set build) — the old 7x exploded count-distinct
    exchange must not reappear."""
    from datetime import datetime as dt

    df = spark.createDataFrame(
        [(1, dt(2024, 1, 1)), (2, dt(2024, 1, 5))], "user_id int, ts timestamp"
    )
    plan = (
        sliding_distinct_count(df, "ts", "user_id", 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one exchange keyed by the entity, one tiny final keyed by day,
    # one SinglePartition for the 1-row span — but only ONE may carry
    # the entity key (the old shape had two corpus-scale exchanges)
    import re

    hashed = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    ent_keyed = [h for h in hashed if "__ent" in h]
    assert len(set(ent_keyed)) <= 1, plan
    assert "count(distinct" not in plan.lower(), plan
