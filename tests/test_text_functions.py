"""Text building blocks not covered by the oracle queries."""

from __future__ import annotations

import pyspark.sql.functions as F

from hpc_hd_textreuse_etl_spark.functions.text import (
    ROLLING_HASH_MOD,
    bpe_ish_token_count,
    char_shingles_of,
    lang_guess,
    rolling_hash,
    token_shingles,
)


def test_rolling_hash_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a"), (4, "")],
        "id int, t string",
    )
    got = {r.id: r.h for r in df.select("id", rolling_hash("t").alias("h")).collect()}
    assert got[1] == got[2]                  # deterministic
    assert got[1] != got[3]                  # order matters (vs bag-of-words)
    assert got[4] == 0                       # empty → fold init
    assert all(0 <= h < ROLLING_HASH_MOD for h in got.values())


def test_bpe_ish_token_count(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello, world!"), (3, "a1 b2-c3")],
        "id int, t string",
    )
    got = {r.id: r.n for r in df.select("id", bpe_ish_token_count("t").alias("n")).collect()}
    assert got[2] > got[1]  # punctuation adds subword tokens
    assert got[3] >= 4


def test_char_and_token_shingles(spark):
    df = spark.createDataFrame([("abcdef", )], "t string")
    chars = df.select(char_shingles_of("t", 3).alias("s")).first().s
    assert chars == ["abc", "bcd", "cde", "def"]
    df2 = spark.createDataFrame([("a b c d", )], "t string")
    toks = df2.select(token_shingles("t", 2).alias("s")).first().s
    assert toks == ["a b", "b c", "c d"]


def test_lang_guess_custom_profiles(spark):
    profiles = {"x": ("foo", "bar"), "y": ("baz",)}
    df = spark.createDataFrame(
        [(1, "foo bar bar"), (2, "baz baz foo"), (3, "nothing here")],
        "id int, t string",
    )
    got = {
        r.id: r.g
        for r in df.select("id", lang_guess("t", profiles).alias("g")).collect()
    }
    assert got == {1: "x", 2: "y", 3: "unknown"}
