"""Fuzzy edit-distance joins: blocking soundness and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.fuzzy import fuzzy_join, fuzzy_self_join


def _names(spark, values):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "nid bigint, name string"
    )


def test_self_join_matches_brute_force(spark):
    import random

    rng = random.Random(5)
    vocab = ["red", "blue", "bolt", "gear", "ring", "widget", "gizmo"]
    values = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        for _ in range(80)
    ]
    df = _names(spark, values).dropDuplicates(["name"])
    got = {
        (r["id_a"], r["id_b"], r["edit_distance"])
        for r in fuzzy_self_join(df, "nid", "name", max_dist=2).collect()
    }
    rows = df.collect()

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (x["nid"], y["nid"], lev(x["name"], y["name"]))
        for x in rows
        for y in rows
        if x["nid"] < y["nid"] and lev(x["name"], y["name"]) <= 2
    }
    assert got == want


def test_bucket_boundary_pair_not_missed(spark):
    # lengths 5 and 6 straddle a bucket edge at w = max_dist+1 = 2
    # (floor(5/2)=2, floor(6/2)=3) — the neighbor-bucket explode must
    # still produce the pair
    df = _names(spark, ["abcde", "abcdef"])
    [row] = fuzzy_self_join(df, "nid", "name", max_dist=1).collect()
    assert (row["id_a"], row["id_b"], row["edit_distance"]) == (0, 1, 1)


def test_pairs_emitted_exactly_once(spark):
    df = _names(spark, ["aaa", "aab", "abb"])
    out = fuzzy_self_join(df, "nid", "name", max_dist=3).collect()
    keys = [(r["id_a"], r["id_b"]) for r in out]
    assert len(keys) == len(set(keys)) == 3


def test_block_cols_restrict_candidates(spark):
    df = spark.createDataFrame(
        [(0, "abc", "x"), (1, "abd", "x"), (2, "abe", "y")],
        "nid bigint, name string, grp string",
    )
    out = fuzzy_self_join(df, "nid", "name", max_dist=1, block_cols=["grp"])
    assert [(r["id_a"], r["id_b"]) for r in out.collect()] == [(0, 1)]


def test_two_table_join(spark):
    left = spark.createDataFrame([(1, "kitten")], "lid bigint, lname string")
    right = spark.createDataFrame(
        [(10, "sitting"), (11, "mitten"), (12, "zebra")],
        "rid bigint, rname string",
    )
    out = {
        (r["lid"], r["rid"]): r["edit_distance"]
        for r in fuzzy_join(
            left, right, "lid", "rid", "lname", "rname", max_dist=3
        ).collect()
    }
    assert out == {(1, 10): 3, (1, 11): 1}


def test_plan_has_no_cartesian_and_one_shuffle_side(spark):
    df = _names(spark, ["aa", "ab", "ba"])
    plan = (
        fuzzy_self_join(df, "nid", "name", max_dist=1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_max_dist_zero_is_exact_match_join(spark):
    df = _names(spark, ["same", "same2"])
    dup = spark.createDataFrame([(99, "same")], "nid bigint, name string")
    out = fuzzy_join(
        df, dup, "nid", "nid", "name", "name", max_dist=0
    ).collect()
    assert [(r["nid_l"], r["nid_r"], r["edit_distance"]) for r in out] == [
        (0, 99, 0)
    ]
