"""Association-rule mining (operators/basket.py): exact supports vs a
brute-force itertools count, confidence/lift arithmetic, Apriori prune.
"""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.operators.basket import (
    association_rules,
    frequent_items,
    prune_to_frequent,
)

BASKETS = {
    1: ["a", "b", "c"],
    2: ["a", "b"],
    3: ["a", "c", "c"],   # duplicate item in basket: counts once
    4: ["b", "c"],
    5: ["a"],
    6: ["d"],             # singleton-only item
}


def _df(spark):
    rows = [(b, i) for b, items in BASKETS.items() for i in items]
    return spark.createDataFrame(rows, "basket int, item string")


def brute_rules():
    sets = {b: set(i) for b, i in BASKETS.items()}
    n = len(sets)
    singles = {}
    for s in sets.values():
        for i in s:
            singles[i] = singles.get(i, 0) + 1
    pairs = {}
    for s in sets.values():
        for a, b in combinations(sorted(s), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    out = {}
    for (a, b), n_ab in pairs.items():
        out[(a, b)] = (
            n_ab, singles[a], singles[b], n,
            n_ab / singles[a],
            (n_ab * n) / (singles[a] * singles[b]),
        )
    return out


def test_rules_match_brute_force(spark):
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"],
            r["confidence"], r["lift"],
        )
        for r in association_rules(_df(spark), "basket", "item").collect()
    }
    assert got == brute_rules()


def test_min_pair_support_filters(spark):
    out = association_rules(_df(spark), "basket", "item", min_pair_support=2)
    expect = {k: v for k, v in brute_rules().items() if v[0] >= 2}
    got = {(r["item_a"], r["item_b"]) for r in out.collect()}
    assert got == set(expect)


def test_frequent_items_and_prune(spark):
    freq = {r["item"]: r["n"] for r in frequent_items(_df(spark), "basket", "item", 2).collect()}
    assert freq == {"a": 4, "b": 3, "c": 3}
    pruned = prune_to_frequent(_df(spark), "basket", "item", 2)
    assert {r["item"] for r in pruned.collect()} == {"a", "b", "c"}
    # pruning keeps every qualifying pair's supports intact; n_baskets
    # (and hence lift) legitimately shrinks when a basket loses ALL its
    # items — the prune redefines the universe to baskets that can
    # still form pairs (basket 6 = {'d'} drops out here)
    cnt = lambda rows: sorted(
        (r["item_a"], r["item_b"], r["n_ab"], r["n_a"], r["n_b"]) for r in rows
    )
    full = association_rules(_df(spark), "basket", "item", 2).collect()
    after = association_rules(pruned, "basket", "item", 2).collect()
    assert cnt(full) == cnt(after)
    assert {r["n_baskets"] for r in after} == {5}


def test_pair_join_is_not_a_nested_loop(spark):
    plan = association_rules(_df(spark), "basket", "item")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the broadcast of the 1-row
    # n_baskets aggregate; the pair join itself must be hash/merge
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_partition_independence(spark):
    df = _df(spark)
    a = sorted(map(tuple, association_rules(df, "basket", "item").collect()))
    b = sorted(map(tuple, association_rules(df.repartition(7), "basket", "item").collect()))
    assert a == b


# --- randomized equivalence -------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

baskets_st = st.lists(
    st.tuples(st.integers(0, 15), st.sampled_from("abcdefg")),
    min_size=0,
    max_size=60,
)


@given(baskets_st)
@settings(max_examples=15, deadline=None)
def test_rules_random_equivalence(spark, rows):
    df = (
        spark.createDataFrame(rows, "basket int, item string")
        if rows
        else spark.createDataFrame([], "basket int, item string")
    )
    got = {
        (r["item_a"], r["item_b"]): (r["n_ab"], r["n_a"], r["n_b"], r["n_baskets"])
        for r in association_rules(df, "basket", "item").collect()
    }
    sets = {}
    for b, i in rows:
        sets.setdefault(b, set()).add(i)
    n = len(sets)
    singles = {}
    for s in sets.values():
        for i in s:
            singles[i] = singles.get(i, 0) + 1
    want = {}
    for s in sets.values():
        for a, b in combinations(sorted(s), 2):
            k = (a, b)
            want[k] = want.get(k, (0,))[0] + 1, singles[a], singles[b], n
    assert got == want
