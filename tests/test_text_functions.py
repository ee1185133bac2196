"""Text building blocks not covered by the oracle queries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

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


def test_tokens_regex_matches_split_filter_formulation(spark):
    """tokens() extracts \\S+ runs with one compiled regex; this pins
    it to the split+filter formulation it replaced across leading /
    trailing / repeated whitespace, tabs+newlines, empty and blank
    strings, and a custom (fallback-path) pattern."""
    from hpc_hd_textreuse_etl_spark.functions.text import tokens

    samples = [" lead", "trail ", "", "   ", "a\tb\nc", "one",
               "  double  spaced  ", "\r\nmixed\twhite\nspace "]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    c = F.col("t")
    naive = F.filter(F.split(c, r"\s+"), lambda t: t != "")
    for r in df.select("t", tokens("t").alias("got"), naive.alias("want")).collect():
        assert r["got"] == r["want"], r["t"]
    # custom pattern goes through the split+filter fallback unchanged
    got = (
        spark.createDataFrame([("a,b,,c",)], "t string")
        .select(tokens("t", ",").alias("x"))
        .first()
        .x
    )
    assert got == ["a", "b", "c"]


def test_char_shingles_regex_matches_lambda_formulation(spark):
    """char_shingles_of runs as one compiled-regex pass; this pins it
    element-for-element to the naive per-position substr lambda it
    replaced, across the edge cases the regex could plausibly break:
    newlines inside grams ((?s)), surrogate pairs (one code point = one
    char), texts shorter than n (single short shingle), the empty
    string, and an exact-length text."""
    samples = [
        "hello world",
        "ab\ncd\nef line",
        "a",
        "",
        "héllo wörld ünïcode",
        "emoji \U0001f600\U0001f600 pair test",
        "tabs\tand\nnewlines\r\nmix",
        "exact",
        "\n\n\n\n\n\n",
        "aaaaaaaaaa",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    for n in (2, 5, 8):
        c = F.col("t")
        naive = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(n)),
        )
        rows = df.select(
            "t", char_shingles_of("t", n).alias("got"), naive.alias("want")
        ).collect()
        for r in rows:
            assert r["got"] == r["want"], (n, r["t"])


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


def test_repetition_stats_hand_computed(spark):
    """Gopher repetition gates on a document with known structure:
    4 non-empty lines, 'nav bar' line duplicated (2 of 4 lines), and
    'spam spam' as the dominant bigram."""
    from hpc_hd_textreuse_etl_spark.functions.text import repetition_stats

    text = "nav bar\nnav bar\nspam spam spam spam\nunique line here"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = df.select(
        *[v.alias(k) for k, v in repetition_stats("text").items()]
    ).collect()[0]
    # 2 duplicated lines out of 4
    assert row.dup_line_fraction == pytest.approx(2 / 4)
    # dup chars = 2 * len('nav bar') = 14; total line chars = 7+7+19+16 = 49
    assert row.dup_line_char_fraction == pytest.approx(14 / 49)
    # bigrams: 'spam spam' x3 (within line 3... across lines too), top
    # bigram covers n * len('spam spam') chars of the full text
    toks = text.split()
    bigrams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    top = max(set(bigrams), key=lambda g: (bigrams.count(g), len(g)))
    expect = bigrams.count(top) * len(top) / len(text)
    assert row.top_bigram_char_fraction == pytest.approx(expect)


def test_repetition_stats_degenerate_docs(spark):
    from hpc_hd_textreuse_etl_spark.functions.text import repetition_stats

    df = spark.createDataFrame(
        [(1, "one"), (2, "a b"), (3, "x\nx\nx")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in df.select(
            "doc_id", *[v.alias(k) for k, v in repetition_stats("text").items()]
        ).collect()
    }
    assert rows[1].dup_line_fraction == 0.0  # single line, no dups
    assert rows[3].dup_line_fraction == 1.0  # all three lines identical
    assert rows[3].dup_line_char_fraction == 1.0


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

from hpc_hd_textreuse_etl_spark.functions.text import scrub_pii  # noqa: E402


def _scrub_one(spark, text):
    df = spark.createDataFrame([(text,)], "t string")
    cols = scrub_pii("t")
    [row] = df.select(
        *[v.alias(k) for k, v in cols.items()]
    ).collect()
    return row.asDict()


def test_scrub_pii_each_category(spark):
    r = _scrub_one(
        spark,
        "mail a@b.org visit https://x.io/p?q=1 host 10.0.0.1 tel +1-555-0100 end",
    )
    assert (r["url_count"], r["email_count"], r["ip_count"], r["phone_count"]) == (
        1, 1, 1, 1,
    )
    assert r["scrubbed"] == "mail <EMAIL> visit <URL> host <IP> tel <PHONE> end"


def test_scrub_pii_url_absorbs_inner_email_and_ip(spark):
    # the URL is replaced first, so its userinfo-ish '@' and dotted
    # digits never reach the email/IP stages
    r = _scrub_one(spark, "see http://u@h.com/10.0.0.1/x now")
    assert r["url_count"] == 1
    assert r["email_count"] == 0
    assert r["ip_count"] == 0
    assert r["scrubbed"] == "see <URL> now"


def test_scrub_pii_multiple_matches_counted(spark):
    r = _scrub_one(spark, "a@b.co c@d.co")
    assert r["email_count"] == 2
    assert r["scrubbed"] == "<EMAIL> <EMAIL>"


def test_scrub_pii_clean_text_untouched(spark):
    r = _scrub_one(spark, "no pii here, just words and 3.14 pie")
    assert r["scrubbed"] == "no pii here, just words and 3.14 pie"
    assert (r["url_count"], r["email_count"], r["ip_count"], r["phone_count"]) == (
        0, 0, 0, 0,
    )


# ---------------------------------------------------------------------------
# Sorted-run fold formulations (round-11 optimization) vs the naive
# quadratic per-distinct-element spellings they replaced
# ---------------------------------------------------------------------------


def test_fold_formulations_match_naive_quadratic_spellings(spark):
    """The round-11 rewrite replaced interpreted higher-order spellings
    that re-evaluated the tokenizer regex per array element (token
    n-grams via positional slice; per-distinct-element filter counts in
    repetition_stats; per-profile filter counts in stopword_ratio /
    lang_guess) with single sorted-run ``aggregate`` folds. This pins
    the new forms bit-for-bit to the original formulations on edge
    cases: NULL, empty, whitespace-only, single-token, all-duplicate,
    tie-ridden bigram counts, and multi-line documents."""
    from hpc_hd_textreuse_etl_spark.functions.text import (
        DEFAULT_STOPWORDS,
        repetition_stats,
        stopword_ratio,
        token_shingles,
        tokens,
    )

    docs = [
        None, "", " ", "\n", "one", "a b", "the the the", "x\nx\nx",
        "nav\nnav\nbody text here\n\n nav", "a b a b c d c d",
        "der die das und der die", "t1 t2 t1 t2 t1 t3",
        # regex-formulation hazards for stopword_ratio (round 11):
        # punctuation-attached tokens must NOT count, prefix words must
        # not shadow longer ones ('a' vs 'and'), tabs/ends are token
        # boundaries, adjacent stopwords all count
        "the.", "(the a)", "a\tof", "andy and band", "is",
        "to the is of and in a", "a a", "of. of, of of",
    ]
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "id long, text string"
    )
    c = F.col("text")
    toks = tokens("text")

    # naive originals, inlined
    naive_sh2 = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
    )
    naive_sr = F.when(
        F.size(toks) > 0,
        F.size(F.filter(toks, lambda t: t.isin(*DEFAULT_STOPWORDS))).cast(
            "double"
        )
        / F.size(toks),
    )
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    uniq = F.array_distinct(lines)
    dup_counts = F.filter(
        F.transform(
            uniq,
            lambda l: F.struct(
                F.length(l).alias("len"),
                F.size(F.filter(lines, lambda x: x == l)).alias("n"),
            ),
        ),
        lambda s: s["n"] > 1,
    )
    naive_dn = F.aggregate(dup_counts, F.lit(0), lambda acc, s: acc + s["n"])
    bigrams = token_shingles(c, 2)
    naive_top = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda g: F.struct(
                F.size(F.filter(bigrams, lambda x: x == g)).alias("n"),
                F.length(g).alias("len"),
            ),
        )
    )
    stats = repetition_stats("text")
    rows = df.select(
        "id",
        token_shingles(c, 2).alias("sh2"),
        naive_sh2.alias("nsh2"),
        stopword_ratio("text").alias("sr"),
        naive_sr.alias("nsr"),
        stats["dup_line_fraction"].alias("dlf"),
        F.when(
            F.size(lines) > 0, naive_dn.cast("double") / F.size(lines)
        ).otherwise(F.lit(0.0)).alias("ndlf"),
        stats["top_bigram_char_fraction"].alias("tbcf"),
        F.when(
            (F.length(c) > 0) & (F.size(bigrams) > 0),
            (naive_top["n"] * naive_top["len"]).cast("double") / F.length(c),
        ).otherwise(F.lit(0.0)).alias("ntbcf"),
    ).collect()
    for r in rows:
        assert repr(r["sh2"]) == repr(r["nsh2"]), (r["id"], docs[r["id"]])
        assert repr(r["sr"]) == repr(r["nsr"]), (r["id"], docs[r["id"]])
        assert repr(r["dlf"]) == repr(r["ndlf"]), (r["id"], docs[r["id"]])
        assert repr(r["tbcf"]) == repr(r["ntbcf"]), (r["id"], docs[r["id"]])
