"""Sliding-window document chunking for LLM training pipelines.

Long documents must be cut into model-context-sized pieces before
tokenized packing (operators/packing.py); retrieval corpora use the
same operation with overlap so no answer span is ever split across a
boundary. The operator is a pure per-row explode:

    tokens   = whitespace tokens of the document (functions/text.tokens)
    starts   = 0, stride, 2*stride, …   (stride = chunk_tokens - overlap)
    chunk_i  = tokens[start_i : start_i + chunk_tokens]

with one subtlety — the **containment rule**: a start is emitted only
while ``start + overlap < n_tokens``; otherwise the chunk would consist
entirely of tokens already present in its predecessor (the final
window's fresh region would be empty). The rule keeps chunk sets
minimal while still covering every token exactly once in the
``overlap=0`` case and at-least-once otherwise.

Scale shape: zero shuffles. The whole operator is Generate(posexplode)
over per-row Catalyst arrays — it pipelines inside the scan stage,
parallel over input splits, and the text column is never exchanged.
Chunk rows inherit the parent's partitioning, which is exactly what the
downstream hash-gated sampling / packing steps want (they key on
``(id, chunk_id)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.functions.text import tokens


def chunk_starts(n_tokens_col, chunk_tokens: int, overlap_tokens: int):
    """Array of window starts: ``sequence(0, greatest(n-overlap-1, 0),
    stride)`` — contains 0 whenever the document is non-empty, and a
    further ``k*stride`` iff ``k*stride + overlap < n`` (containment
    rule above). Empty documents produce no starts."""
    stride = chunk_tokens - overlap_tokens
    upper = F.greatest(n_tokens_col - F.lit(overlap_tokens + 1), F.lit(0))
    return F.when(
        n_tokens_col > 0, F.sequence(F.lit(0), upper, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int,
    overlap_tokens: int = 0,
    chunk_id_col: str = "chunk_id",
    chunk_text_col: str = "chunk_text",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Output: ``(id_col, chunk_id, n_tokens, chunk_text)`` — ``chunk_id``
    is the 0-based window index (= start // stride, so it is stable
    regardless of how many chunks the document has), ``n_tokens`` the
    actual window size (only the final window may be short).
    Deterministic per row; documents with zero tokens yield zero rows.
    """
    if chunk_tokens <= 0:
        raise ValueError(f"chunk_tokens must be positive, got {chunk_tokens}")
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError(
            f"overlap_tokens must be in [0, chunk_tokens), got {overlap_tokens}"
        )
    toks = tokens(text_col)
    # One Project evaluates the tokenizer regex ONCE per document
    # (whole-stage codegen eliminates the common subexpression across
    # these aliases). posexplode_OUTER + a null-start filter above the
    # Generate replaces the non-outer explode, whose inferred
    # ``size(__starts) > 0`` pre-filter Catalyst pushes BELOW this
    # projection — re-running the tokenizer expression per row a second
    # time (and a third, via alias inlining) in an operator with no CSE
    # against the Project. Semantics are identical: empty-start docs
    # yield one all-NULL generated row, dropped by the cheap filter.
    with_tok = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        F.size(toks).alias("__n"),
        chunk_starts(F.size(toks), chunk_tokens, overlap_tokens).alias("__starts"),
    )
    exploded = with_tok.select(
        id_col,
        "__toks",
        "__n",
        F.posexplode_outer("__starts").alias(chunk_id_col, "__start"),
    ).filter(F.col("__start").isNotNull())
    # window size from counts, not from re-slicing the token array —
    # consumers that drop chunk_text (e.g. packing) then prune __toks
    # entirely and the Generate carries two ints instead of the array
    n_tok = (
        F.least(F.col("__start") + F.lit(chunk_tokens), F.col("__n"))
        - F.col("__start")
    )
    window = F.slice(
        F.col("__toks"), F.col("__start") + 1, F.lit(chunk_tokens)
    )
    return exploded.select(
        id_col,
        F.col(chunk_id_col).cast("int").alias(chunk_id_col),
        n_tok.cast("int").alias(n_tokens_col),
        F.array_join(window, " ").alias(chunk_text_col),
    )
