"""Property tests: BM25 (ops/retrieval.py) and the hashed-feature
classifier's feature builder (ops/classifier.py) against plain-Python
references on hypothesis-generated corpora.

One example = one generated corpus + query set driven through the full
scoring path (Spark actions cost ~100 ms, so examples are few and the
generator favors the breaking shapes: repeated terms, single-term docs,
query terms absent from the corpus, duplicate query terms, empty
documents)."""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from knovexlite_spark.ops.classifier import hashed_features
from knovexlite_spark.ops.retrieval import bm25_scores

# small closed vocabulary => guaranteed term collisions across docs
_WORDS = ["alpha", "beta", "gamma", "delta", "x", "yy", "alpha"]

doc_text = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=12
).map(" ".join)
corpus = st.lists(doc_text, min_size=1, max_size=6)
queries = st.lists(
    st.lists(st.sampled_from(_WORDS + ["absent"]), min_size=1, max_size=4).map(
        " ".join
    ),
    min_size=1,
    max_size=3,
)


def _bm25_ref(docs, qs, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfs: dict[str, int] = {}
    for v in toks.values():
        for t in set(v):
            dfs[t] = dfs.get(t, 0) + 1
    out = {}
    for qid, qt in qs:
        for d, v in toks.items():
            s, hit = 0.0, False
            for term in dict.fromkeys(qt.split()):
                tf = v.count(term)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
                s += idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(v) / avgdl)
                )
            if hit:
                out[(qid, d)] = s
    return out


@settings(max_examples=8, deadline=None)
@given(texts=corpus, qtexts=queries)
def test_bm25_property_matches_reference(spark, texts, qtexts):
    docs = list(enumerate(texts))
    qs = [(100 + i, q) for i, q in enumerate(qtexts)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    qdf = spark.createDataFrame(qs, "query_id long, text string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(ddf, qdf).collect()
    }
    want = _bm25_ref(docs, qs)
    assert set(got) == set(want)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, rel=1e-9)


@settings(max_examples=8, deadline=None)
@given(texts=corpus)
def test_hashed_features_property_matches_md5_replay(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["bucket"]): r["cnt"]
        for r in hashed_features(df, 64).collect()
    }
    want: dict = {}
    for d, t in docs:
        for term in t.split():
            b = int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % 64
            want[(d, b)] = want.get((d, b), 0) + 1
    assert got == want
