"""Property tests for operators/classifier.py (hashed-feature Naive
Bayes quality filter) against an independent pure-Python recomputation,
plus the invariants the docstrings promise (partition independence,
total coverage, loud one-class failure, lazy escape hatch). The full
trainer + scorer additionally sit under the DuckDB value-hash gate via
the quality_classifier_weights / quality_classifier_ranking contract
queries (tests/test_oracle_parity.py)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from hpc_hd_textreuse_etl_spark.catalog import load_testdata
from hpc_hd_textreuse_etl_spark.operators.classifier import (
    nb_quality_model,
    nb_quality_scores,
)
from tests.conftest import SF_SMOKE

NUM_BUCKETS = 512


@pytest.fixture(scope="module")
def tables(spark):
    load_testdata(spark, SF_SMOKE)
    return spark


def _portable_h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_counts(text: str) -> Counter:
    w = text.split()
    c: Counter = Counter()
    for g in w + [f"{a} {b}" for a, b in zip(w, w[1:])]:
        c[_portable_h(g) % NUM_BUCKETS] += 1
    return c


@pytest.fixture(scope="module")
def py_reference(tables):
    """Pure-Python NB trained on lang=='en' over the smoke documents:
    (per-bucket class counts, per-doc log-odds)."""
    rows = tables.table("documents").select("doc_id", "text", "lang").collect()
    per_doc = {r["doc_id"]: _py_counts(r["text"]) for r in rows}
    pos: Counter = Counter()
    neg: Counter = Counter()
    n_pos_docs = n_neg_docs = 0
    for r in rows:
        if r["lang"] == "en":
            pos.update(per_doc[r["doc_id"]])
            n_pos_docs += 1
        else:
            neg.update(per_doc[r["doc_id"]])
            n_neg_docs += 1
    n_pos, n_neg = sum(pos.values()), sum(neg.values())

    def log_ratio(b: int) -> float:
        return math.log((pos.get(b, 0) + 1.0) / (n_pos + NUM_BUCKETS)) - math.log(
            (neg.get(b, 0) + 1.0) / (n_neg + NUM_BUCKETS)
        )

    prior = math.log(n_pos_docs) - math.log(n_neg_docs)
    scores = {
        d: prior + sum(c * log_ratio(b) for b, c in cnts.items())
        for d, cnts in per_doc.items()
    }
    return pos, neg, log_ratio, scores


def _labeled(tables):
    return tables.table("documents").withColumn(
        "is_pos", F.col("lang") == "en"
    )


def test_model_counts_match_python_exactly(tables, py_reference):
    """The integer count core is bit-exact (this is what the DuckDB gate
    hashes); log_ratio matches to float tolerance."""
    pos, neg, log_ratio, _ = py_reference
    got = {
        r["bucket"]: r
        for r in nb_quality_model(
            _labeled(tables), "doc_id", "text", "is_pos",
            num_buckets=NUM_BUCKETS, hash_family="portable",
        ).collect()
    }
    assert len(got) == NUM_BUCKETS  # dense: every bucket has a row
    for b in range(NUM_BUCKETS):
        assert got[b]["cnt_pos"] == pos.get(b, 0)
        assert got[b]["cnt_neg"] == neg.get(b, 0)
        assert got[b]["log_ratio"] == pytest.approx(log_ratio(b), abs=1e-12)


def test_scores_match_python_reference(tables, py_reference):
    _, _, _, want = py_reference
    got = {
        r["doc_id"]: r["log_odds"]
        for r in nb_quality_scores(
            _labeled(tables), _labeled(tables), "doc_id", "text", "is_pos",
            num_buckets=NUM_BUCKETS, hash_family="portable",
        ).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == pytest.approx(want[d], abs=1e-9)


def test_scores_partition_independent(tables):
    """Sorted-struct fold ⇒ identical bits under any partitioning."""
    lab = _labeled(tables)

    def snap(df):
        return sorted(
            tuple(r)
            for r in nb_quality_scores(
                df, lab, "doc_id", "text", "is_pos",
                num_buckets=NUM_BUCKETS, hash_family="portable",
            ).collect()
        )

    assert snap(lab) == snap(lab.repartition(37, "lang"))


def test_separates_classes(tables):
    """The trained filter must actually discriminate: AUC of the scores
    against the training labels is well above chance (en vs non-en
    documents differ in vocabulary by construction of the testdata)."""
    from hpc_hd_textreuse_etl_spark.operators.evaluation import roc_auc

    lab = _labeled(tables)
    scored = nb_quality_scores(
        lab, lab, "doc_id", "text", "is_pos", num_buckets=NUM_BUCKETS
    ).join(lab.select("doc_id", "is_pos"), "doc_id")
    auc = roc_auc(scored, "log_odds", "is_pos").collect()[0]["auc"]
    assert auc > 0.8


def test_empty_doc_scores_prior_only(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta", True), (2, "gamma delta", False), (3, "", True)],
        "doc_id long, text string, is_pos boolean",
    )
    got = {
        r["doc_id"]: r["log_odds"]
        for r in nb_quality_scores(
            df, df, "doc_id", "text", "is_pos", num_buckets=64,
            hash_family="portable",
        ).collect()
    }
    assert got[3] == pytest.approx(math.log(2.0), abs=1e-12)  # ln(2/1)


def test_one_class_labels_raise(spark):
    df = spark.createDataFrame(
        [(1, "alpha", True), (2, "beta", True)],
        "doc_id long, text string, is_pos boolean",
    )
    out = nb_quality_scores(df, df, "doc_id", "text", "is_pos", num_buckets=64)
    with pytest.raises(Exception, match="one-class"):
        out.collect()


def test_model_reuse_equals_inline_training(tables):
    lab = _labeled(tables)
    m = nb_quality_model(
        lab, "doc_id", "text", "is_pos",
        num_buckets=NUM_BUCKETS, hash_family="portable",
    )
    reused = nb_quality_scores(
        lab, lab, "doc_id", "text", "is_pos",
        num_buckets=NUM_BUCKETS, hash_family="portable", model=m,
    )
    inline = nb_quality_scores(
        lab, lab, "doc_id", "text", "is_pos",
        num_buckets=NUM_BUCKETS, hash_family="portable",
    )
    assert sorted(map(tuple, reused.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_lazy_escape_hatch(tables):
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        live_checkpoint_count,
    )

    lab = _labeled(tables)
    before = live_checkpoint_count()
    lazy = nb_quality_scores(
        lab, lab, "doc_id", "text", "is_pos",
        num_buckets=NUM_BUCKETS, hash_family="portable",
        use_checkpoints=False,
    )
    assert live_checkpoint_count() == before
    eager = nb_quality_scores(
        lab, lab, "doc_id", "text", "is_pos",
        num_buckets=NUM_BUCKETS, hash_family="portable",
    )
    assert sorted(map(tuple, lazy.collect())) == sorted(
        map(tuple, eager.collect())
    )


def test_validates_alpha(tables):
    with pytest.raises(ValueError):
        nb_quality_model(
            _labeled(tables), "doc_id", "text", "is_pos", alpha=0.0
        )


# ---------------------------------------------------------------------------
# Logistic-regression quality filter (lr_quality_model / lr_quality_scores)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def py_lr_reference(tables):
    """Pure-Python full-batch GD on the same length-normalized hashed
    features, labels lang=='en' — 8 rounds, lr=0.5, l2=0.0, replicating
    lr_quality_model's update expression tree exactly."""
    rows = tables.table("documents").select("doc_id", "text", "lang").collect()
    feats = {}
    for r in rows:
        c = _py_counts(r["text"])
        total = float(sum(c.values()))
        feats[r["doc_id"]] = {b: n / total for b, n in c.items()} if total else {}
    y = {r["doc_id"]: 1.0 if r["lang"] == "en" else 0.0 for r in rows}
    n = len(rows)
    w = [0.0] * NUM_BUCKETS
    bias = 0.0
    lr, l2 = 0.5, 0.0
    for _ in range(8):
        resid = {}
        for d, x in feats.items():
            # margin folds in bucket order, like the engine
            m = bias + sum(
                (x[b] * w[b] for b in sorted(x)), start=0.0
            )
            resid[d] = 1.0 / (1.0 + math.exp(-m)) - y[d]
        g = [0.0] * NUM_BUCKETS
        per_bucket = {}
        for d, x in feats.items():
            for b, v in x.items():
                per_bucket.setdefault(b, []).append((d, resid[d] * v))
        for b, terms in per_bucket.items():
            s = 0.0
            for _, t in sorted(terms):  # doc-id order, like the engine
                s += t
            g[b] = s
        gbias = 0.0
        for d in sorted(resid):
            gbias += resid[d]
        w = [wi - lr * ((g[b] / n) + l2 * wi) for b, wi in enumerate(w)]
        bias = bias - lr * (gbias / n)
    scores = {
        d: bias + sum((x[b] * w[b] for b in sorted(x)), start=0.0)
        for d, x in feats.items()
    }
    return w, bias, scores


def test_lr_weights_match_python_gd(tables, py_lr_reference):
    from hpc_hd_textreuse_etl_spark.operators.classifier import lr_quality_model

    w_ref, bias_ref, _ = py_lr_reference
    model = {
        r.bucket: r.weight
        for r in lr_quality_model(
            _labeled(tables), "doc_id", "text", "is_pos",
            num_buckets=NUM_BUCKETS, iters=8, learning_rate=0.5,
            hash_family="portable",
        ).collect()
    }
    assert len(model) == NUM_BUCKETS + 1
    assert model[-1] == pytest.approx(bias_ref, abs=1e-12)
    for b in range(NUM_BUCKETS):
        assert model[b] == pytest.approx(w_ref[b], abs=1e-12), b
    # the fit moved: at least some weights are nonzero
    assert sum(1 for v in model.values() if v != 0.0) > 10


def test_lr_scores_match_python_and_separate_classes(tables, py_lr_reference):
    from hpc_hd_textreuse_etl_spark.operators.classifier import lr_quality_scores

    _, _, scores_ref = py_lr_reference
    got = {
        r.doc_id: r.score
        for r in lr_quality_scores(
            _labeled(tables), _labeled(tables), "doc_id", "text", "is_pos",
            num_buckets=NUM_BUCKETS, iters=8, learning_rate=0.5,
            hash_family="portable",
        ).collect()
    }
    assert set(got) == set(scores_ref)
    for d, s in scores_ref.items():
        assert got[d] == pytest.approx(s, abs=1e-12), d
    langs = {
        r["doc_id"]: r["lang"]
        for r in tables.table("documents").select("doc_id", "lang").collect()
    }
    pos = [got[d] for d, l in langs.items() if l == "en"]
    neg = [got[d] for d, l in langs.items() if l != "en"]
    assert sum(pos) / len(pos) > sum(neg) / len(neg)


def test_lr_model_reuse_and_validations(tables, spark):
    from hpc_hd_textreuse_etl_spark.operators.classifier import (
        lr_quality_model,
        lr_quality_scores,
    )

    lab = _labeled(tables)
    model = lr_quality_model(
        lab, "doc_id", "text", "is_pos", num_buckets=64, iters=2,
        hash_family="portable",
    )
    reused = lr_quality_scores(
        lab, None, "doc_id", "text", "is_pos", num_buckets=64,
        hash_family="portable", model=model,
    )
    inline = lr_quality_scores(
        lab, lab, "doc_id", "text", "is_pos", num_buckets=64, iters=2,
        hash_family="portable",
    )
    assert sorted(map(tuple, reused.collect())) == sorted(
        map(tuple, inline.collect())
    )
    with pytest.raises(ValueError, match="one-class"):
        lr_quality_model(
            lab.withColumn("is_pos", F.lit(True)), "doc_id", "text",
            "is_pos", num_buckets=64, iters=1,
        )
    with pytest.raises(ValueError, match="iters"):
        lr_quality_model(lab, "doc_id", "text", "is_pos", iters=0)
    with pytest.raises(ValueError, match="learning_rate"):
        lr_quality_model(
            lab, "doc_id", "text", "is_pos", learning_rate=0.0
        )
    with pytest.raises(ValueError, match="labeled or model"):
        lr_quality_scores(lab, None, "doc_id", "text", "is_pos")


def test_lr_null_labels_raise_before_pinning(tables):
    """NULL labels would silently bias (xxhash64) or poison (portable)
    the gradient — the trainer must refuse them loudly, and the refusal
    must not leak localCheckpoints (validation runs before pinning)."""
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        live_checkpoint_count,
    )
    from hpc_hd_textreuse_etl_spark.operators.classifier import lr_quality_model

    lab = _labeled(tables).withColumn(
        "is_pos", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("is_pos"))
    )
    before = live_checkpoint_count()
    with pytest.raises(ValueError, match="NULL labels"):
        lr_quality_model(lab, "doc_id", "text", "is_pos", num_buckets=64, iters=1)
    assert live_checkpoint_count() == before  # nothing was pinned


def test_lr_one_class_refusal_leaks_no_checkpoints(tables):
    from hpc_hd_textreuse_etl_spark.functions.checkpoints import (
        live_checkpoint_count,
    )
    from hpc_hd_textreuse_etl_spark.operators.classifier import lr_quality_model

    lab = _labeled(tables)
    before = live_checkpoint_count()
    with pytest.raises(ValueError, match="one-class"):
        lr_quality_model(
            lab.withColumn("is_pos", F.lit(False)), "doc_id", "text",
            "is_pos", num_buckets=64, iters=1,
        )
    assert live_checkpoint_count() == before


def test_lr_scores_refuse_mismatched_bucket_space(tables):
    """A model trained with num_buckets=64 must not silently part-join
    against features hashed into 128 buckets (the model_store params
    check only guards the reload path; direct DataFrame reuse needs its
    own guard)."""
    from hpc_hd_textreuse_etl_spark.operators.classifier import (
        lr_quality_model,
        lr_quality_scores,
    )

    lab = _labeled(tables)
    model = lr_quality_model(
        lab, "doc_id", "text", "is_pos", num_buckets=64, iters=1,
        hash_family="portable",
    )
    with pytest.raises(ValueError, match="num_buckets"):
        lr_quality_scores(
            lab, None, "doc_id", "text", "is_pos", num_buckets=128,
            hash_family="portable", model=model,
        )


def test_lr_training_partition_independent(tables):
    """With portable folds, the trained LR weights are a pure function
    of the data — bit-identical regardless of input partitioning (the
    sorted-struct fold contract every gated double sum follows)."""
    from hpc_hd_textreuse_etl_spark.operators.classifier import lr_quality_model

    lab = _labeled(tables)
    kw = dict(num_buckets=64, iters=3, learning_rate=0.5,
              hash_family="portable")
    one = {
        r.bucket: r.weight
        for r in lr_quality_model(
            lab.coalesce(1), "doc_id", "text", "is_pos", **kw
        ).collect()
    }
    many = {
        r.bucket: r.weight
        for r in lr_quality_model(
            lab.repartition(17), "doc_id", "text", "is_pos", **kw
        ).collect()
    }
    assert one == many
