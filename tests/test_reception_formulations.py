"""Round-11 optimization guard: the ``unique_keys=True`` window-filter
formulation of ``reception_edges`` must emit exactly the anti-join
formulation's edges whenever member keys are unique — including ties
for the minimum and NULL order values — and the two must differ only
in the documented duplicate-key case."""

from __future__ import annotations

from hpc_hd_textreuse_etl_spark.operators.reception import reception_edges


def _edges(spark, rows, unique_keys):
    df = spark.createDataFrame(rows, "g long, k long, d string")
    out = reception_edges(df, "g", "k", "d", unique_keys=unique_keys)
    return sorted(tuple(r) for r in out.collect())


def test_unique_key_formulation_matches_anti_join(spark):
    rows = [
        # plain group: one earliest, two later
        (1, 10, "2020-01-01"), (1, 11, "2020-02-01"), (1, 12, "2020-03-01"),
        # tie for earliest: both are sources, neither is a destination
        (2, 20, "2020-01-01"), (2, 21, "2020-01-01"), (2, 22, "2020-05-01"),
        # NULL order: never earliest, always a destination
        (3, 30, "2020-01-01"), (3, 31, None),
        # all-NULL group: no earliest, no edges
        (4, 40, None), (4, 41, None),
        # singleton group: no edges
        (5, 50, "2020-01-01"),
    ]
    assert _edges(spark, rows, True) == _edges(spark, rows, False)
    # sanity: the tie group fans out 2 sources × 1 destination
    got = _edges(spark, rows, True)
    assert (2, 20, 22) in got and (2, 21, 22) in got
    assert (3, 30, 31) in got
    assert not any(g in (4, 5) for g, _, _ in got)


def test_duplicate_keys_keep_the_anti_join_semantics_distinct(spark):
    # key 99 is earliest in group 1 but a later member of group 2: the
    # anti-join removes BOTH rows of the key from the destination side;
    # the unique-keys filter (documented as requiring unique keys) keeps
    # the group-2 row. This pins why unique_keys defaults to False.
    rows = [
        (1, 99, "2020-01-01"), (1, 11, "2020-02-01"),
        (2, 20, "2020-01-01"), (2, 99, "2020-03-01"),
    ]
    anti = _edges(spark, rows, False)
    uniq = _edges(spark, rows, True)
    assert (2, 20, 99) not in anti
    assert (2, 20, 99) in uniq
    assert set(anti) <= set(uniq)
