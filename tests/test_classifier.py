"""Hashed-feature logistic quality classifier (ops/classifier.py):
training parity against an independent NumPy full-batch GD reference
(identical md5 feature hashing), separation on a synthetic
quality/noise corpus, scoring/filtering contracts, plan pins."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.classifier import (
    classify,
    hashed_features,
    quality_filter,
    train_quality_classifier,
)

N_BUCKETS = 512

POS = [
    (0, "the study presents a rigorous analysis of the proposed method"),
    (1, "we evaluate the model on standard benchmarks and report results"),
    (2, "related work has explored similar analysis in prior studies"),
    (3, "the results indicate a consistent improvement over the baseline"),
]
NEG = [
    (0, "click here buy now free offer limited deal deal deal"),
    (1, "win big casino jackpot click click subscribe free free"),
    (2, "cheap pills buy offer now click subscribe win jackpot"),
    (3, "free free free deal offer casino pills click now win"),
]


def _bucket(term: str, n=N_BUCKETS) -> int:
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n


def _feats_ref(docs, n=N_BUCKETS):
    out = {}
    for d, t in docs:
        row = {}
        for term in t.split():
            b = _bucket(term, n)
            row[b] = row.get(b, 0) + 1
        if row:
            out[d] = row
    return out


def _train_ref(pos, neg, n=N_BUCKETS, epochs=5, lr=0.5, l2=1e-6):
    feats = {}
    for d, row in _feats_ref(pos, n).items():
        feats[2 * d] = (row, 1.0)
    for d, row in _feats_ref(neg, n).items():
        feats[2 * d + 1] = (row, 0.0)
    n_docs = len(feats)
    w = np.zeros(n, dtype=np.float64)
    bias = 0.0
    for _ in range(epochs):
        grad = np.zeros(n, dtype=np.float64)
        bias_g = 0.0
        for row, y in feats.values():
            m = sum(c * w[b] for b, c in row.items()) + bias
            r = 1.0 / (1.0 + np.exp(-m)) - y
            for b, c in row.items():
                grad[b] += c * r
            bias_g += r
        w -= lr * (grad / n_docs + l2 * w)
        bias -= lr * (bias_g / n_docs)
    return w, bias


def _frames(spark):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    return pos, neg


def test_hashed_features_match_md5_replay(spark):
    pos, _ = _frames(spark)
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_features(pos, N_BUCKETS).collect()
    }
    want = {
        (d, b): c
        for d, row in _feats_ref(POS).items()
        for b, c in row.items()
    }
    assert got == want


def test_training_matches_numpy_reference(spark):
    pos, neg = _frames(spark)
    w, b = train_quality_classifier(
        pos, neg, n_buckets=N_BUCKETS, epochs=5, lr=0.5, l2=1e-6
    )
    w_ref, b_ref = _train_ref(POS, NEG, epochs=5)
    assert b == pytest.approx(b_ref, abs=1e-10)
    assert np.allclose(w, w_ref, atol=1e-10)


def test_classifier_separates_quality_from_spam(spark):
    pos, neg = _frames(spark)
    w, b = train_quality_classifier(pos, neg, n_buckets=N_BUCKETS, epochs=30)
    test = spark.createDataFrame(
        [
            (100, "a rigorous analysis of benchmark results and baselines"),
            (101, "free casino deal click now win pills offer"),
        ],
        "doc_id long, text string",
    )
    probs = {r["doc_id"]: r["prob"] for r in classify(test, w, b).collect()}
    assert probs[100] > 0.5 > probs[101]
    kept = quality_filter(test, w, b, threshold=0.5).collect()
    assert [r["doc_id"] for r in kept] == [100]


def test_empty_doc_scores_bias_alone(spark):
    pos, neg = _frames(spark)
    w, b = train_quality_classifier(pos, neg, n_buckets=N_BUCKETS, epochs=3)
    test = spark.createDataFrame(
        [(7, ""), (8, "   ")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["margin"] for r in classify(test, w, b).collect()}
    assert rows[7] == pytest.approx(b) and rows[8] == pytest.approx(b)


def test_training_accepts_string_doc_ids(spark):
    """ADVICE r7 (low): the old doc_id*2 / *2+1 tagging NULL-cast a
    string id under non-ANSI Spark, collapsing all docs into one group
    and silently corrupting n_docs and the gradient.  String-id frames
    must now train to EXACTLY the same weights as the numeric-id
    frames (the tag is id-type-agnostic)."""
    pos, neg = _frames(spark)
    pos_s = pos.select(F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"),
                       "text")
    neg_s = neg.select(F.concat(F.lit("doc-"), F.col("doc_id")).alias("doc_id"),
                       "text")
    w_num, b_num = train_quality_classifier(
        pos, neg, n_buckets=N_BUCKETS, epochs=5
    )
    w_str, b_str = train_quality_classifier(
        pos_s, neg_s, n_buckets=N_BUCKETS, epochs=5
    )
    assert b_str == pytest.approx(b_num, abs=1e-12)
    assert np.allclose(w_str, w_num, atol=1e-12)


def test_xxhash_family_runs_and_is_deterministic(spark):
    pos, neg = _frames(spark)
    a = sorted(
        map(tuple, hashed_features(pos, 64, family="xxhash64").collect())
    )
    b = sorted(
        map(tuple, hashed_features(pos, 64, family="xxhash64").collect())
    )
    assert a == b and a
    assert all(0 <= r[1] < 64 for r in a)
    with pytest.raises(ValueError, match="family"):
        hashed_features(pos, 64, family="sha1")


def test_classify_plan_broadcasts_model(spark):
    pos, neg = _frames(spark)
    w = np.zeros(N_BUCKETS)
    w[3] = 1.0
    plan = (
        classify(pos, w, 0.1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final


def _train_ref_norm(pos, neg, n=N_BUCKETS, epochs=5, lr=0.5, l2=1e-6):
    """NumPy twin of normalize=True training: per-doc L1 tf features."""
    feats = {}
    for d, row in _feats_ref(pos, n).items():
        tot = sum(row.values())
        feats[2 * d] = ({b: c / tot for b, c in row.items()}, 1.0)
    for d, row in _feats_ref(neg, n).items():
        tot = sum(row.values())
        feats[2 * d + 1] = ({b: c / tot for b, c in row.items()}, 0.0)
    n_docs = len(feats)
    w = np.zeros(n, dtype=np.float64)
    bias = 0.0
    for _ in range(epochs):
        grad = np.zeros(n, dtype=np.float64)
        bias_g = 0.0
        for row, y in feats.values():
            m = sum(c * w[b] for b, c in row.items()) + bias
            r = 1.0 / (1.0 + np.exp(-m)) - y
            for b, c in row.items():
                grad[b] += c * r
            bias_g += r
        w -= lr * (grad / n_docs + l2 * w)
        bias -= lr * (bias_g / n_docs)
    return w, bias


def test_normalized_training_matches_numpy_reference(spark):
    """normalize=True (per-doc tf features — the scale-stable form the
    natural-margin rehearsal measured the need for) against the NumPy
    twin with identical normalization."""
    pos, neg = _frames(spark)
    w, b = train_quality_classifier(
        pos, neg, n_buckets=N_BUCKETS, epochs=5, normalize=True
    )
    w_ref, b_ref = _train_ref_norm(POS, NEG)
    assert abs(b - b_ref) < 1e-10
    assert np.max(np.abs(w - w_ref)) < 1e-10


def test_normalized_scoring_matches_training_space(spark):
    """classify(normalize=True) scores in the same tf feature space the
    model was trained in: margins equal the NumPy margins; a mismatch
    (training normalized, scoring raw) would inflate margins by doc
    length."""
    pos, neg = _frames(spark)
    w, b = train_quality_classifier(
        pos, neg, n_buckets=N_BUCKETS, epochs=5, normalize=True
    )
    got = {
        r["doc_id"]: r["margin"]
        for r in classify(pos, w, b, normalize=True).collect()
    }
    for d, t in POS:
        row = {}
        for term in t.split():
            bkt = _bucket(term)
            row[bkt] = row.get(bkt, 0) + 1
        tot = sum(row.values())
        want = sum(c / tot * w[bkt] for bkt, c in row.items()) + b
        assert abs(got[d] - want) < 1e-9, d
    # filtering composes with the flag
    kept = quality_filter(pos, w, b, threshold=0.0, normalize=True)
    assert kept.count() == len(POS)
