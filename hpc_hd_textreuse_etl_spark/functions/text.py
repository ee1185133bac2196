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
    """Token n-grams joined by a separator (array<string>).

    Built by zipping the token array with its own shifted suffixes
    (``zip_with`` chain) instead of a positional ``transform`` whose
    lambda re-slices a *tokenization expression*: higher-order lambdas
    evaluate interpreted, so ``slice(tokens(c), i+1, n)`` inside the
    lambda re-ran the tokenizer regex over the WHOLE document once per
    position — O(tokens × doc_len) per row (measured as the hot stack
    in the corpus-audit profile). The zip form evaluates ``tokens``
    O(n) times per row and the lambda touches only its two operands.
    Semantics are unchanged (property-tested against the positional
    formulation): ``concat_ws`` drops the null padding ``zip_with``
    adds beyond the shorter side, exactly like the clamped ``slice``;
    empty token lists still yield the single degenerate ``[""]``."""
    toks = tokens(col)
    grams = toks
    for k in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, k + 1, F.size(toks)),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    grams = F.slice(grams, 1, F.greatest(F.size(toks) - n, F.lit(0)) + 1)
    # empty OR NULL token lists both yield [""] — the degenerate gram the
    # positional formulation produced (greatest() skips the NULL size)
    return F.when(F.size(toks) > 0, grams).otherwise(F.array(F.lit("")))


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
        # one fold computes count and char total together (the regex
        # tokenizer backing ``toks`` runs once for this column, not
        # three times); same left-to-right double accumulation order
        "avg_token_len": F.aggregate(
            toks,
            F.struct(F.lit(0).alias("n"), F.lit(0.0).alias("chars")),
            lambda a, t: F.struct(
                (a["n"] + 1).alias("n"),
                (a["chars"] + F.length(t).cast("double")).alias("chars"),
            ),
            lambda a: F.when(a["n"] > 0, a["chars"] / a["n"].cast("double")),
        ),
        "type_token_ratio": F.when(
            n > 0, F.size(F.array_distinct(toks)).cast("double") / n
        ),
    }


def stopword_ratio(
    col: Column | str, stopwords: tuple[str, ...] = DEFAULT_STOPWORDS
) -> Column:
    """Stopword hits / token count (NULL for token-less docs).

    Two compiled-regex passes, no interpreted lambda: token count is
    ``size(regexp_extract_all('\\S+'))`` and the hit count matches each
    stopword as a COMPLETE whitespace-delimited token via lookarounds
    (``(?:(?<=\\s)|^)(?:w1|w2|…)(?=\\s|$)``) — exactly the "whole token
    equals a stopword" predicate the previous ``aggregate`` fold
    applied per element. The fold ran interpreted (higher-order
    lambdas sit outside whole-stage codegen, allocating a struct per
    token), and because scorer callers filter on ``score IS NOT NULL``
    the pushed-down filter made every row pay it twice; the regex
    passes stay inside the JVM's compiled-pattern loop. Same integers,
    same division, identical output (equivalence property-tested
    against the fold in tests/test_text_functions.py).

    Stopwords containing whitespace (or empty strings) can never equal
    a ``\\S+`` token and are dropped from the pattern; alternation is
    ordered longest-first so a prefix word cannot shadow a longer one.
    """
    import re as _re

    c = F.col(col) if isinstance(col, str) else col
    n = F.size(tokens(c))
    words = [
        w for w in stopwords if w and not any(ch.isspace() for ch in w)
    ]
    if not words:
        return F.when(n > 0, F.lit(0.0))
    alts = "|".join(
        _re.escape(w) for w in sorted(set(words), key=lambda w: (-len(w), w))
    )
    pattern = r"(?:(?<=\s)|^)(?:" + alts + r")(?=\s|$)"
    hits = F.size(F.regexp_extract_all(c, F.lit(pattern), 0))
    return F.when(n > 0, hits.cast("double") / n.cast("double"))


def repetition_stats(col: Column | str) -> dict[str, Column]:
    """Gopher-style repetition signals — the standard web-crawl quality
    gates for boilerplate/spam (duplicated nav lines, keyword stuffing):

    - ``dup_line_fraction``: duplicated lines / total lines;
    - ``dup_line_char_fraction``: characters sitting in duplicated
      lines / total characters;
    - ``top_bigram_char_fraction``: characters covered by the most
      frequent word bigram / total characters.

    Pure Catalyst higher-order folds, one pass per document, no shuffle
    and no Python.

    Occurrence counting runs as a single sorted-run fold per array
    (``array_sort`` + one ``aggregate`` scan tracking the current run):
    O(k log k) per document. The previous spelling counted each
    distinct element with a fresh ``filter`` over the whole array AND
    — because higher-order lambdas evaluate interpreted, re-evaluating
    any non-trivial expression they close over — re-derived the
    line/bigram arrays themselves per element, which made the bigram
    leg effectively cubic in document length (profiled as minutes per
    document batch on the corpus audit; the hot stack was the
    tokenizer regex re-running inside nested lambdas). Same counts,
    same divisions, bit-identical fractions (equivalence-pinned in
    tests/test_text_functions.py)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.filter(F.split(c, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)

    def _dup_totals(arr: Column) -> Column:
        """Fold over the sorted array: total members of runs of length
        ≥ 2 (``dn``) and their character mass (``dc``) — exactly
        Σ_{v: count(v)>1} count(v) and Σ count(v)·len(v)."""
        close_dn = lambda a: a["dn"] + F.when(a["run"] > 1, a["run"]).otherwise(0)
        close_dc = lambda a: a["dc"] + F.when(
            a["run"] > 1, a["run"] * F.length(a["prev"])
        ).otherwise(0)
        return F.aggregate(
            F.array_sort(arr),
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("dn"),
                F.lit(0).alias("dc"),
            ),
            lambda a, x: F.when(
                x.eqNullSafe(a["prev"]),
                F.struct(
                    a["prev"].alias("prev"),
                    (a["run"] + 1).alias("run"),
                    a["dn"].alias("dn"),
                    a["dc"].alias("dc"),
                ),
            ).otherwise(
                F.struct(
                    x.alias("prev"),
                    F.lit(1).alias("run"),
                    close_dn(a).alias("dn"),
                    close_dc(a).alias("dc"),
                )
            ),
            lambda a: F.struct(close_dn(a).alias("dn"), close_dc(a).alias("dc")),
        )

    line_dups = _dup_totals(lines)
    total_line_chars = F.aggregate(
        lines, F.lit(0), lambda acc, l: acc + F.length(l)
    )
    bigrams = token_shingles(c, 2)
    # most-frequent-bigram char product n·len via the same sorted-run
    # fold; ties resolve by larger len, matching array_max over
    # struct(n, len) lexicographic ordering
    top_bigram_prod = F.aggregate(
        F.array_sort(bigrams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("bn"),
            F.lit(0).alias("bl"),
        ),
        lambda a, x: F.when(
            x.eqNullSafe(a["prev"]),
            F.struct(
                a["prev"].alias("prev"),
                (a["run"] + 1).alias("run"),
                a["bn"].alias("bn"),
                a["bl"].alias("bl"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("run"),
                F.when(
                    (a["run"] > a["bn"])
                    | ((a["run"] == a["bn"]) & (F.length(a["prev"]) > a["bl"])),
                    a["run"],
                ).otherwise(a["bn"]).alias("bn"),
                F.when(
                    (a["run"] > a["bn"])
                    | ((a["run"] == a["bn"]) & (F.length(a["prev"]) > a["bl"])),
                    F.length(a["prev"]),
                ).otherwise(a["bl"]).alias("bl"),
            )
        ),
        lambda a: F.when(
            (a["run"] > a["bn"])
            | ((a["run"] == a["bn"]) & (F.length(a["prev"]) > a["bl"])),
            a["run"] * F.length(a["prev"]),
        ).otherwise(a["bn"] * a["bl"]),
    )
    n_chars = F.length(c)
    return {
        "dup_line_fraction": F.when(
            n_lines > 0, line_dups["dn"].cast("double") / n_lines
        ).otherwise(F.lit(0.0)),
        "dup_line_char_fraction": F.when(
            total_line_chars > 0,
            line_dups["dc"].cast("double") / total_line_chars,
        ).otherwise(F.lit(0.0)),
        "top_bigram_char_fraction": F.when(
            (n_chars > 0) & (F.size(bigrams) > 0),
            top_bigram_prod.cast("double") / n_chars,
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
    profile scores > 0. Deterministic tie-break: profile order.

    All profile counts accumulate in ONE ``aggregate`` fold over the
    token array and the arg-max when-chain runs in the fold's finish
    lambda over the accumulator fields — so the tokenizer regex runs
    once per document. The previous per-profile ``size(filter(...))``
    columns were each referenced once per branch of the when-chain,
    re-running the regex ~k² times per row (interpreted higher-order
    inputs are re-evaluated per reference). Identical counts,
    identical tie-break, identical output (equivalence-pinned)."""
    toks = tokens(col)
    langs = list(profiles)

    def _merge(a: Column, t: Column) -> Column:
        return F.struct(
            *[
                (
                    a[f"s{i}"]
                    + F.when(t.isin(*profiles[lang]), 1).otherwise(0)
                ).alias(f"s{i}")
                for i, lang in enumerate(langs)
            ]
        )

    def _finish(a: Column) -> Column:
        best = None
        for i, lang in enumerate(langs):
            cond = F.lit(True)
            for j in range(i):  # earlier profiles win ties
                cond = cond & (a[f"s{i}"] > a[f"s{j}"])
            for j in range(i + 1, len(langs)):
                cond = cond & (a[f"s{i}"] >= a[f"s{j}"])
            cond = cond & (a[f"s{i}"] > 0)
            best = F.when(cond, lang) if best is None else best.when(cond, lang)
        return best.otherwise(default)

    agg = F.aggregate(
        toks,
        F.struct(*[F.lit(0).alias(f"s{i}") for i in range(len(langs))]),
        _merge,
        _finish,
    )
    # NULL text: the fold yields NULL where the filter-count spelling
    # yielded ``default`` — restore that contract
    return F.coalesce(agg, F.lit(default))


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
