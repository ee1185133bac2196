"""Unit gates for the scale-data generators (examples/scale_ladder.py):
the Zipf hot-key tiers and the organic text-permutation family.

These guard the two subtle constructions the scale artifacts depend on.
The organic generator perturbs document text with THREE sequential
group-rotation translates (5x6x6 CASE branches instead of a 180-branch
codegen killer). Because the rotation groups overlap on 'u' and 'l',
the composition is NOT char-for-char the replicated generator's
single-translate family — what the dedup semantics actually require,
and what is gated here, is: identity at perm 0, every composition a
bijection (reversible, length-preserving), all 180 compositions
distinct (so (template, perm) collisions — not accidental mapping
reuse — decide near-duplicate pairs), and the Spark expression
computing exactly what the Python model predicts.
"""

from __future__ import annotations

import importlib.util
import os
import string
import sys

from pyspark.sql import functions as F

_LADDER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples",
    "scale_ladder.py",
)
_spec = importlib.util.spec_from_file_location("scale_ladder", _LADDER)
scale_ladder = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("scale_ladder", scale_ladder)
_spec.loader.exec_module(scale_ladder)

_GROUPS = ("aeiou", "shrdlu", "tnclmw")


def _factored_perm(text: str, r: int) -> str:
    """Python model of the organic generator's three-stage translate."""

    def rot(s: str, k: int) -> str:
        k %= len(s)
        return s[k:] + s[:k]

    for group, sel in (
        (_GROUPS[0], r % 5),
        (_GROUPS[1], (r // 5) % 6),
        (_GROUPS[2], (r // 30) % 6),
    ):
        text = text.translate(str.maketrans(group, rot(group, sel)))
    return text


def test_permutation_family_identity_bijection_distinct():
    alphabet = string.ascii_lowercase + string.digits + " "
    assert _factored_perm(alphabet, 0) == alphabet  # identity at 0
    outs = set()
    for r in range(180):
        mapped = _factored_perm(alphabet, r)
        # bijection: same multiset of chars, same length
        assert sorted(mapped) == sorted(alphabet), r
        outs.add(mapped)
    assert len(outs) == 180  # no two perm ids share a mapping


def test_permutation_family_is_invertible_on_text():
    # bijectivity implies near-dup structure is preserved: two docs with
    # the SAME template and the SAME perm are byte-identical; with
    # different perms they differ (unless the template avoids all
    # remapped chars)
    sample = "the quick brown fox jumps over thirteen lazy hounds"
    seen = {_factored_perm(sample, r) for r in range(180)}
    assert len(seen) == 180


def test_spark_expression_matches_python_model(spark):
    """The generator's nested-CASE translate column must compute exactly
    the Python model for every perm id (run all 180 through one tiny
    DataFrame — this is the cross-engine gate for the organic docs)."""
    sample = "the quick brown fox jumps over thirteen lazy hounds 0123"
    df = spark.range(180).select(
        F.col("id").alias("__perm"), F.lit(sample).alias("text")
    )

    def rot(s: str, k: int) -> str:
        k %= len(s)
        return s[k:] + s[:k]

    perm = F.col("__perm")
    text = F.col("text")
    for group, selector in (
        (_GROUPS[0], perm % 5),
        (_GROUPS[1], (perm / 5).cast("int") % 6),
        (_GROUPS[2], (perm / 30).cast("int") % 6),
    ):
        rotated = text
        for k in range(1, len(group)):
            rotated = F.when(
                selector == k, F.translate(text, group, rot(group, k))
            ).otherwise(rotated)
        text = rotated
    got = {r["__perm"]: r["out"] for r in df.withColumn("out", text).collect()}
    for r in range(180):
        assert got[r] == _factored_perm(sample, r), r


def test_zipf_hot_key_tiers_produce_documented_shares(spark):
    df = spark.range(200_000).select(
        F.col("id").alias("uniq"), (F.col("id") % 1000 + 100).alias("key")
    )
    skewed = df.withColumn(
        "key", scale_ladder._zipf_hot_key("key", "uniq", [0, 1, 2], seed=7)
    )
    n = skewed.count()
    shares = {
        r["key"]: r["c"] / n
        for r in skewed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"))
        .limit(3)
        .collect()
    }
    # xxhash64 coin over 200k draws: binomial std-dev ~0.1%
    assert abs(shares[0] - 0.20) < 0.01
    assert abs(shares[1] - 0.10) < 0.01
    assert abs(shares[2] - 0.05) < 0.01
    # rows outside the tiers keep their original key (no key invented)
    kept = skewed.where(F.col("key") >= 100)
    assert kept.join(df, ["uniq", "key"]).count() == kept.count()
