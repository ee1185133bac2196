"""Text-analysis building blocks for large-scale corpus pipelines.

All hot-path expressions are Catalyst built-ins / higher-order functions
(JVM-side, codegen'd) — no Python UDFs. This extends the engine beyond
the reference's surface (its only text functions are id-splitting and
LENGTH, SURVEY §2.8) toward the operations a training-data pipeline
needs: tokenization, quality scoring, language ID, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization / shingles
# ---------------------------------------------------------------------------


def tokens(col: Column | str, pattern: str = r"\s+") -> Column:
    """Whitespace tokens (array<string>); never contains empties.

    The default pattern runs as ``regexp_extract_all('\\S+')`` — one
    compiled-regex pass extracting non-whitespace runs, exactly the
    split-then-drop-empties result without the interpreted
    higher-order ``filter`` lambda (~30% cheaper on document-scale
    text; edge-pinned in tests/test_text_functions.py). A custom
    ``pattern`` falls back to split + filter, since a split pattern
    cannot generically be inverted into an extraction pattern."""
    c = F.col(col) if isinstance(col, str) else col
    if pattern == r"\s+":
        return F.regexp_extract_all(c, F.lit(r"\S+"), 0)
    return F.filter(F.split(c, pattern), lambda t: t != "")


def bpe_ish_token_count(col: Column | str) -> Column:
    """Approximate subword token count: words plus punctuation runs plus
    digit runs, the usual pre-BPE segmentation regex. JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(
        F.filter(
            F.split(c, r"(?=[^\w])|(?<=[^\w])"),
            lambda t: (t != "") & (t != " "),
        )
    )


def char_shingles_of(colname: str, n: int = 5) -> Column:
    """Character n-grams of a named column (array<string>); texts
    shorter than ``n`` emit their whole text as a single short shingle.

    Overlapping grams come from one compiled-regex pass —
    ``(?s)(?=(.{n})).`` captures the gram in a lookahead and consumes
    one char — which measured ~5× faster than a per-position
    ``transform``/``substr`` lambda (higher-order functions evaluate
    interpreted, outside whole-stage codegen; the regex scan stays
    JVM-compiled). ``(?s)`` keeps grams crossing newlines; ``.``
    consumes a full code point, so surrogate pairs count as one char
    exactly like ``substr`` (property-tested against the lambda
    formulation in tests/test_text_functions.py)."""
    c = F.col(colname)
    grams = F.regexp_extract_all(c, F.lit(f"(?s)(?=(.{{{int(n)}}}))."), 1)
    return F.when(F.length(c) >= n, grams).otherwise(
        F.array(c.substr(F.lit(1), F.lit(int(n))))
    )


def token_shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-grams joined by a separator (array<string>)."""
    toks = tokens(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


# ---------------------------------------------------------------------------
# Quality metrics
# ---------------------------------------------------------------------------

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")


def token_stats(col: Column | str) -> dict[str, Column]:
    """Reusable quality columns; compose into a select/withColumns."""
    toks = tokens(col)
    c = F.col(col) if isinstance(col, str) else col
    n = F.size(toks)
    return {
        "n_chars": F.length(c),
        "n_tokens": n,
        "n_unique_tokens": F.size(F.array_distinct(toks)),
        "avg_token_len": F.when(
            n > 0,
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
            )
            / n,
        ),
        "type_token_ratio": F.when(
            n > 0, F.size(F.array_distinct(toks)).cast("double") / n
        ),
    }


def stopword_ratio(
    col: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks))


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signals — the standard web-crawl quality
    gates for boilerplate/spam (duplicated nav lines, keyword stuffing):

    - ``dup_line_fraction``: duplicated lines / total lines;
    - ``dup_line_char_fraction``: characters sitting in duplicated
      lines / total characters;
    - ``top_bigram_char_fraction``: characters covered by the most
      frequent word bigram / total characters.

    Pure Catalyst higher-order folds, one pass per document, no shuffle
    and no Python — per-row cost is O(lines + bigrams²) on bounded
    per-document arrays, independent of corpus size."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    uniq = F.array_distinct(lines)
    # lines occurring 2+ times, with their occurrence counts
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
    n_dup_lines = F.aggregate(
        dup_counts, F.lit(0), lambda acc, s: acc + s["n"]
    )
    dup_line_chars = F.aggregate(
        dup_counts, F.lit(0), lambda acc, s: acc + s["len"] * s["n"]
    )
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    bigrams = token_shingles(c, 2)
    top_bigram = F.array_max(
        F.transform(
            F.array_distinct(bigrams),
            lambda g: F.struct(
                F.size(F.filter(bigrams, lambda x: x == g)).alias("n"),
                F.length(g).alias("len"),
            ),
        )
    )
    n_chars = F.length(c)
    return {
        "dup_line_fraction": F.when(
            n_lines > 0, n_dup_lines.cast("double") / n_lines
        ).otherwise(F.lit(0.0)),
        "dup_line_char_fraction": F.when(
            total_line_chars > 0,
            dup_line_chars.cast("double") / total_line_chars,
        ).otherwise(F.lit(0.0)),
        "top_bigram_char_fraction": F.when(
            (n_chars > 0) & (F.size(bigrams) > 0),
            (top_bigram["n"] * top_bigram["len"]).cast("double") / n_chars,
        ).otherwise(F.lit(0.0)),
    }


# ---------------------------------------------------------------------------
# Language identification (profile-scoring heuristic)
# ---------------------------------------------------------------------------

#: tiny built-in stopword profiles; callers supply corpus-specific ones
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "zu", "ein"),
    "es": ("el", "la", "de", "y", "es", "en", "un"),
}


def lang_scores(col: Column | str, profiles: dict[str, tuple[str, ...]] = LANG_PROFILES) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words)))
        for lang, words in profiles.items()
    }


def lang_guess(
    col: Column | str,
    profiles: dict[str, tuple[str, ...]] = LANG_PROFILES,
    default: str = "unknown",
) -> Column:
    """Arg-max language over stopword-hit counts; ``default`` when no
    profile scores > 0. Deterministic tie-break: profile order."""
    scores = lang_scores(col, profiles)
    langs = list(scores)
    best = None
    for lang in langs:
        cond = F.lit(True)
        seen_before = langs[: langs.index(lang)]
        after = langs[langs.index(lang) + 1 :]
        for o in seen_before:  # earlier profiles win ties
            cond = cond & (scores[lang] > scores[o])
        for o in after:
            cond = cond & (scores[lang] >= scores[o])
        cond = cond & (scores[lang] > 0)
        best = F.when(cond, lang) if best is None else best.when(cond, lang)
    return best.otherwise(default)


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def normalized_md5(col: Column | str) -> Column:
    """Canonical document fingerprint: md5 of lower-cased,
    whitespace-collapsed text (stable across engines)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.trim(F.lower(c)), r"\s+", " "))


ROLLING_HASH_MOD = 1_000_000_007
ROLLING_HASH_BASE = 31


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash over whitespace tokens (each token hashed
    with xxhash64 first): ``h = (h*31 + |xxhash64(tok)|) mod 1e9+7``.
    Pure Catalyst fold — deterministic at any scale."""
    toks = tokens(col)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * ROLLING_HASH_BASE + F.abs(F.xxhash64(t)) % ROLLING_HASH_MOD
        )
        % ROLLING_HASH_MOD,
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------
#
# Standard pre-training hygiene: redact emails / URLs / IP addresses /
# phone numbers before anything else sees the text. Patterns are kept in
# the common subset of Java regex (Spark) and RE2 (DuckDB) — no
# backreferences, no lookaround — so the whole scrub is reproducible in
# the oracle engine. Replacement order matters (a URL can contain an
# email-shaped userinfo part and dotted digits), so counts are taken
# stage-wise on the text as it existed *before* that stage's
# replacement: URL first, then email, then IP, then phone.

#: (name, pattern, replacement token), applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{6,}\d", "<PHONE>"),
)


def scrub_pii(col: Column | str) -> dict[str, Column]:
    """Stage-wise PII redaction. Returns ``{"scrubbed": text-with-
    tokens, "<name>_count": matches-redacted-at-that-stage, ...}``.
    Pure Catalyst (regexp_count / regexp_replace), codegen'd JVM-side."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    cur = c
    for name, pattern, token in PII_PATTERNS:
        out[f"{name}_count"] = F.regexp_count(cur, F.lit(pattern))
        cur = F.regexp_replace(cur, pattern, token)
    out["scrubbed"] = cur
    return out
