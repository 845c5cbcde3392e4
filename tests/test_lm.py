"""n-gram LM perplexity scoring (ops/lm.py) vs a pure-Python
reference — the CCNet-style curation signal.  Float log sums keep it
out of the SQL gate (same category as sampling/packing): parity,
ordering, smoothing and plan shape are pinned here."""

import math

import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.lm import (
    lm_vocab_size,
    perplexity_filter,
    py_ngram_reference,
    score_documents,
    train_ngram_lm,
)

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the mat"),
    (2, "the cat sat on the mat"),  # exact repeat: lowest perplexity
    (3, "zx qq ww ee rr tt"),       # noise: all-unseen-context tail
    (4, "The CAT sat on the MAT"),  # lowercase-normalized == doc 0
    (5, "   "),                     # whitespace-only: no n-grams
]


@pytest.mark.parametrize("n", [1, 2, 3])
def test_scores_match_python_reference(spark, n):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    lm = train_ngram_lm(df, n=n)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["logprob"], r["perplexity"])
        for r in score_documents(df, lm, n=n).collect()
    }
    want = py_ngram_reference(ROWS, n=n)
    assert set(got) == set(want)  # doc 5 absent from both
    assert 5 not in got
    for d in want:
        assert got[d][0] == want[d][0], d
        assert math.isclose(got[d][1], want[d][1], rel_tol=1e-9), d
        assert math.isclose(got[d][2], want[d][2], rel_tol=1e-9), d


def test_perplexity_orders_noise_above_fluent(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    lm = train_ngram_lm(df, n=2)
    ppl = {r["doc_id"]: r["perplexity"] for r in score_documents(df, lm).collect()}
    # the repeated fluent sentence scores far below the noise line
    assert ppl[0] < ppl[3] and ppl[2] < ppl[3]
    assert ppl[0] == ppl[2] == ppl[4]  # lowercase normalization
    kept = {
        r["doc_id"]
        for r in perplexity_filter(df, lm, max_perplexity=ppl[1] + 1e-9).collect()
    }
    assert 3 not in kept and {0, 1, 2, 4} <= kept


def test_min_count_pruning_keeps_normalization(spark):
    """Pruned tail mass must fall to the smoothing floor: ctx_total
    stays the PRE-pruning mass for surviving contexts, so survivors'
    probabilities do not silently inflate."""
    rows = [(i, "a b") for i in range(5)] + [(100, "a c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_ngram_lm(df, n=2, min_count=2)  # prunes ('a','c') cnt=1
    assert lm.filter("context = 'a' AND token = 'c'").count() == 0
    [row] = lm.filter("context = 'a' AND token = 'b'").collect()
    assert row["cnt"] == 5 and row["ctx_total"] == 6  # pre-pruning mass
    got = {
        r["doc_id"]: r["logprob"]
        for r in score_documents(df, lm, n=2).collect()
    }
    want = py_ngram_reference(rows, n=2, min_count=2)
    for d in want:
        assert math.isclose(got[d], want[d][1], rel_tol=1e-9), d


def test_probabilities_sum_to_at_most_one(spark):
    """For any trained context, sum over the FULL smoothed vocabulary
    (trained tokens + OOV slot) is exactly 1 when unpruned."""
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    lm = train_ngram_lm(df, n=2)
    v = lm_vocab_size(lm)
    alpha = 0.1
    rows = lm.collect()
    toks = {r["token"] for r in rows}
    by_ctx = {}
    for r in rows:
        by_ctx.setdefault(r["context"], []).append(r)
    for ctx, members in by_ctx.items():
        tot = members[0]["ctx_total"]
        seen = sum(
            (m["cnt"] + alpha) / (tot + alpha * v) for m in members
        )
        unseen = (len(toks) - len(members) + 1) * alpha / (tot + alpha * v)
        assert math.isclose(seen + unseen, 1.0, rel_tol=1e-9), ctx


def test_train_plan_combinable_and_score_plan_broadcast(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    lm = train_ngram_lm(df, n=2)
    plan = lm._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan  # map-side combine before the exchange
    scored = score_documents(df, lm, n=2)
    splan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in splan
    assert "Cartesian" not in splan and "NestedLoop" not in splan
    # non-broadcast mode for giant models: no broadcast join on the model
    splan2 = (
        score_documents(df, lm, n=2, broadcast_lm=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in splan2


def test_importance_weights_match_python_reference(spark):
    """DSIR weights = exp((lp_target - lp_corpus)/n) per doc — both
    scores replayed by the Python reference trained on the respective
    corpora."""
    target_rows = [(100 + i, "the cat sat on the mat") for i in range(3)]
    corpus_rows = ROWS[:5]
    docs = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    tgt = spark.createDataFrame(target_rows, "doc_id long, text string")
    from knovexlite_spark.ops.lm import importance_weights

    t_lm = train_ngram_lm(tgt, n=2)
    c_lm = train_ngram_lm(docs, n=2)
    got = {
        r["doc_id"]: (r["n_ngrams"], r["logratio"], r["weight"])
        for r in importance_weights(docs, t_lm, c_lm, n=2).collect()
    }

    # independent check: the doc IDENTICAL to the target corpus text
    # (doc 0: 'the cat sat on the mat') must have the HIGHEST weight,
    # and the noise doc (3) the lowest
    ws = {d: got[d][2] for d in got}
    assert ws[0] == max(ws.values())
    assert ws[3] == min(ws.values())
    assert ws[0] > 1.0 > ws[3]
    # weight == exp(logratio) and logratio is per-ngram normalized
    for d in got:
        n_ng, lr, w = got[d]
        assert math.isclose(w, math.exp(lr), rel_tol=1e-12)


def test_dsir_resample_keeps_target_like_docs(spark):
    from knovexlite_spark.ops.lm import dsir_resample

    target = spark.createDataFrame(
        [(200 + i, "the cat sat on the mat") for i in range(3)],
        "doc_id long, text string",
    )
    corpus_rows = [(i, "the cat sat on the mat") for i in range(20)] + [
        (100 + i, f"zx{i} qq ww ee rr tt uu vv") for i in range(20)
    ]
    docs = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    t_lm = train_ngram_lm(target, n=2)
    c_lm = train_ngram_lm(docs, n=2)
    kept = {
        r["doc_id"]
        for r in dsir_resample(docs, t_lm, c_lm, rate=0.3).collect()
    }
    target_like = sum(1 for d in kept if d < 100)
    noise = sum(1 for d in kept if d >= 100)
    assert target_like > noise  # importance resampling skews to target
    # deterministic
    again = {
        r["doc_id"]
        for r in dsir_resample(docs, t_lm, c_lm, rate=0.3).collect()
    }
    assert again == kept
