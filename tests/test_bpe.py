"""BPE trainer (operators/bpe.py) vs a pure-Python reference: merge
choices, greedy rewrite semantics (overlaps!), determinism, inference.
"""

from __future__ import annotations

import pytest

from hpc_hd_textreuse_etl_spark.operators.bpe import bpe_segment, bpe_train

DOCS = [
    (1, "low low low lower lower newest newest"),
    (2, "low newest newest newest wider"),
    (3, "a a a a"),          # overlap stress: greedy pairs, not all pairs
    (4, ""),                 # empty doc drops out
]


def ref_bpe(docs, n_merges, sep="@@"):
    """Reference trainer: dict-counted pairs, greedy left-to-right merge."""
    corpus = {i: t.split() for i, t in docs if t.split()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for toks in corpus.values():
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        (w1, w2), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((w1, w2, n))
        for i, toks in corpus.items():
            out = []
            for t in toks:
                if out and out[-1] == w1 and t == w2:
                    out[-1] = w1 + sep + w2
                else:
                    out.append(t)
            corpus[i] = out
    return merges, {i: " ".join(t) for i, t in corpus.items()}


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_bpe_matches_reference(spark):
    merges_df, corpus_df = bpe_train(_df(spark), "doc_id", "text", 3)
    want_merges, want_corpus = ref_bpe(DOCS, 3)
    got = [
        (r["w1"], r["w2"], r["pair_count"])
        for r in merges_df.orderBy("merge_rank").collect()
    ]
    assert got == want_merges
    got_corpus = {r["doc_id"]: r["text"] for r in corpus_df.collect()}
    assert got_corpus == want_corpus
    assert 4 not in got_corpus  # empty doc dropped


def test_bpe_greedy_overlap_semantics(spark):
    # "a a a a" under merge (a, a): greedy gives two fused pairs, never
    # a chain — the defining difference from replace-all-substrings.
    df = spark.createDataFrame([(1, "a a a a"), (2, "a a a")], "doc_id int, text string")
    merges, corpus = bpe_train(df, "doc_id", "text", 1)
    m = merges.collect()[0]
    assert (m["w1"], m["w2"], m["pair_count"]) == ("a", "a", 5)
    got = {r["doc_id"]: r["text"] for r in corpus.collect()}
    assert got == {1: "a@@a a@@a", 2: "a@@a a"}


def test_bpe_partition_independent(spark):
    df = _df(spark)
    m1, c1 = bpe_train(df, "doc_id", "text", 3)
    m2, c2 = bpe_train(df.repartition(7), "doc_id", "text", 3)
    assert sorted(map(tuple, m1.collect())) == sorted(map(tuple, m2.collect()))
    assert sorted(map(tuple, c1.collect())) == sorted(map(tuple, c2.collect()))


def test_bpe_segment_replays_training(spark):
    df = _df(spark)
    merges, corpus = bpe_train(df, "doc_id", "text", 3)
    replayed = bpe_segment(df, merges, "doc_id", "text")
    assert sorted(map(tuple, replayed.collect())) == sorted(
        map(tuple, corpus.collect())
    )
    # inference on UNSEEN text applies learned merges only
    new = spark.createDataFrame([(9, "low low unseen")], "doc_id int, text string")
    seg = {r["doc_id"]: r["text"] for r in bpe_segment(new, merges, "doc_id", "text").collect()}
    learned = {(r["w1"], r["w2"]) for r in merges.collect()}
    if ("low", "low") in learned:
        assert seg[9].startswith("low@@low")
    assert "unseen" in seg[9]


def test_bpe_validates_n_merges(spark):
    with pytest.raises(ValueError):
        bpe_train(_df(spark), "doc_id", "text", 0)


def test_bpe_exhausted_pairs_is_fixpoint(spark):
    # single-token docs: zero pairs anywhere. Training must be a no-op
    # (empty merge table, corpus unchanged), not a corpus wipe.
    df = spark.createDataFrame([(1, "solo"), (2, "alone")], "doc_id int, text string")
    merges, corpus = bpe_train(df, "doc_id", "text", 2)
    assert merges.count() == 0
    assert {r["doc_id"]: r["text"] for r in corpus.collect()} == {
        1: "solo", 2: "alone",
    }
