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


def test_bigram_features_match_md5_replay(spark):
    """sizes=(1,2) hashes size-tagged terms ('1|w', '2|w1 w2') — the
    Python md5 twin reproduces every (doc, bucket, cnt) exactly; and
    sizes=(1,) stays byte-identical to the historical untagged path."""
    from collections import Counter

    pos, _ = _frames(spark)
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_features(pos, N_BUCKETS, sizes=(1, 2)).collect()
    }
    want: dict = {}
    for d, text in POS:
        toks = text.split()
        terms = [f"1|{t}" for t in toks] + [
            f"2|{a} {b}" for a, b in zip(toks, toks[1:])
        ]
        for b, c in Counter(_bucket(t) for t in terms).items():
            want[(d, b)] = want.get((d, b), 0) + c
    assert got == want
    # default path unchanged (no tag)
    base = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_features(pos, N_BUCKETS).collect()
    }
    ref = {
        (d, b): c
        for d, row in _feats_ref(POS).items()
        for b, c in row.items()
    }
    assert base == ref
    with pytest.raises(ValueError, match="sizes"):
        hashed_features(pos, N_BUCKETS, sizes=())


def test_bigram_tf_model_separates_in_vocabulary_stuffing(spark):
    """The r10 natural rehearsal PROVED unigram tf blind to rotating
    in-vocabulary run-stuffing (simplex averaging: the spam population
    covers every word at the same expected tf as clean, so NO unigram
    weight vector separates).  With hashed bigrams the same tf model
    sees the self-pair signature ("w w" runs) and separates with a
    median-probability gap > 0.1 — the VERDICT r10 #6 criterion —
    while the unigram twin at identical hyperparameters stays blind."""
    import numpy as np

    vocab = [f"w{i:02d}" for i in range(30)]
    rng = np.random.default_rng(17)
    clean_rows = [
        (i, " ".join(vocab[int(x)] for x in rng.integers(0, 30, size=72)))
        for i in range(40)
    ]
    # rotating 6-word subsets in runs of 12 — the rehearsal's spam
    # construction: across the population every word appears at the
    # same expected tf as clean (1/30), preserving unigram blindness
    spam_rows = [
        (
            1000 + i,
            " ".join(
                w
                for w in [vocab[(i * 7 + j * 13) % 30] for j in range(6)]
                for _ in range(12)
            ),
        )
        for i in range(40)
    ]
    clean = spark.createDataFrame(clean_rows, "doc_id long, text string")
    spam = spark.createDataFrame(spam_rows, "doc_id long, text string")
    seed_pos = clean.filter(F.col("doc_id") % 4 == 0)
    seed_neg = spam.filter(F.col("doc_id") % 4 == 0)
    both = clean.unionByName(spam)

    def med_sep(sizes):
        w, b = train_quality_classifier(
            seed_pos, seed_neg, n_buckets=1 << 12, epochs=60, lr=5.0,
            normalize=True, sizes=sizes,
        )
        scored = classify(both, w, b, normalize=True, sizes=sizes)
        probs = {r["doc_id"]: r["prob"] for r in scored.collect()}
        cmed = float(np.median([probs[d] for d, _ in clean_rows]))
        smed = float(np.median([probs[d] for d, _ in spam_rows]))
        return cmed - smed

    sep_uni = med_sep((1,))
    sep_big = med_sep((1, 2))
    assert abs(sep_uni) < 0.05, f"unigram tf unexpectedly separates: {sep_uni}"
    assert sep_big > 0.1, f"bigram separation too small: {sep_big}"
    assert sep_big > abs(sep_uni) + 0.05
