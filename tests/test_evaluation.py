"""Classifier-evaluation operators: threshold sweep + exact ROC-AUC."""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.operators.evaluation import roc_auc, threshold_sweep


def _auc(spark, rows):
    df = spark.createDataFrame(rows, ["score", "label"])
    return roc_auc(df, "score", "label").collect()[0]


def test_sweep_confusion_matrix_hand_example(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.7, 1), (0.7, 0), (None, 1)], ["score", "label"]
    )
    got = {
        r["score"]: (r["n"], r["pos"], r["tp"], r["fp"], r["fn"], r["tn"])
        for r in threshold_sweep(df, "score", "label").collect()
    }
    # NULL score excluded entirely; ties share one row with RANGE cumulatives
    assert got == {
        0.9: (1, 1, 1, 0, 1, 2),
        0.8: (1, 0, 1, 1, 1, 1),
        0.7: (2, 1, 2, 2, 0, 0),
    }


def test_auc_reference_values(spark):
    mid = _auc(spark, [(0.9, 1), (0.8, 0), (0.7, 1)])
    assert (mid["auc"], mid["auc_num2"]) == (0.5, 2)
    perfect = _auc(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])
    assert perfect["auc"] == 1.0
    inverted = _auc(spark, [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)])
    assert inverted["auc"] == 0.0
    all_tied = _auc(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])
    assert all_tied["auc"] == 0.5


def test_auc_null_when_single_class(spark):
    row = _auc(spark, [(0.5, 1), (0.6, 1)])
    assert row["auc"] is None and row["n_neg"] == 0


def test_auc_matches_pair_counting_brute_force(spark):
    import itertools
    import random

    rng = random.Random(7)
    rows = [
        (round(rng.random() * 10) / 10.0, rng.randint(0, 1)) for _ in range(60)
    ]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum(
        1.0 if p > q else (0.5 if p == q else 0.0)
        for p, q in itertools.product(pos, neg)
    )
    expect = wins / (len(pos) * len(neg))
    got = _auc(spark, rows)
    assert got["auc"] == pytest.approx(expect, abs=1e-12)
