"""BM25 retrieval (ops/retrieval.py): float scores pinned by a pure
Python reference; integer sufficient statistics (tf/df/dl) replayed
exactly in DuckDB over the real documents table (the no-gate-slot
pattern shared with as-of joins); plan shapes pinned."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.retrieval import (
    bm25_scores,
    bm25_topk,
    build_postings,
    doc_lengths,
    term_stats,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the dog sleeps in the sun all day the dog"),
    (3, "quick silver fox hunting in the deep woods"),
    (4, "a completely unrelated document about spark partitions"),
    (5, ""),
    (6, "   "),
]
QUERIES = [(10, "quick fox"), (11, "the dog"), (12, "zzz_absent")]


def _bm25_reference(docs, queries, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    vocab = {w for v in toks.values() for w in v}
    dfs = {t: sum(1 for v in toks.values() if t in v) for t in vocab}
    out = {}
    for qid, qt in queries:
        for d, v in toks.items():
            s = 0.0
            hit = False
            for term in dict.fromkeys(qt.split()):
                tf = v.count(term)
                if tf == 0 or term not in dfs:
                    continue
                hit = True
                idf = math.log(1 + (n - dfs[term] + 0.5) / (dfs[term] + 0.5))
                s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
            if hit:
                out[(qid, d)] = s
    return out


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, text string")
    return docs, queries


def test_bm25_scores_match_python_reference(spark):
    docs, queries = _frames(spark)
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_scores(docs, queries).collect()
    }
    want = _bm25_reference(DOCS, QUERIES)
    assert set(got) == set(want)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, rel=1e-9)
    # absent-term query scores nothing; candidate-sized output only
    assert not any(q == 12 for q, _ in got)


def test_bm25_ranking_prefers_rare_terms(spark):
    docs, queries = _frames(spark)
    top = bm25_topk(docs, queries, k=2).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append((r["rn"], r["doc_id"]))
    # 'quick fox': docs 1 and 3 both contain both terms — beat dog docs
    assert {d for _, d in by_q[10]} == {1, 3}
    # 'the dog': doc 2 (dog twice, shorter) outranks doc 1
    assert sorted(by_q[11])[0][1] == 2


def test_bm25_topk_bound_and_determinism(spark):
    docs, queries = _frames(spark)
    a = sorted(map(tuple, bm25_topk(docs, queries, k=1).collect()))
    b = sorted(map(tuple, bm25_topk(docs, queries, k=1).collect()))
    assert a == b
    per_q = {}
    for q, d, s, rn in a:
        per_q.setdefault(q, []).append(rn)
    assert all(v == [1] for v in per_q.values())


def test_postings_stats_match_duckdb_on_documents(spark):
    """Integer index statistics replayed exactly in DuckDB over the
    real documents parquet — tokenization included."""
    from knovexlite_spark.engine import Engine

    from tests.conftest import SF_SMALL
    docs = Engine.for_dir(spark, SF_SMALL).table("documents")
    got_post = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in build_postings(docs).collect()
    }
    got_df = {r["term"]: r["df"] for r in term_stats(build_postings(docs)).collect()}
    got_dl = {r["doc_id"]: r["dl"] for r in doc_lengths(docs).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    want_post = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            r"""
            SELECT doc_id, term, COUNT(*) FROM (
                SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents
            ) WHERE term <> '' GROUP BY 1, 2
            """
        ).fetchall()
    }
    want_df = {
        r[0]: r[1]
        for r in con.execute(
            r"""
            SELECT term, COUNT(DISTINCT doc_id) FROM (
                SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
                FROM documents
            ) WHERE term <> '' GROUP BY 1
            """
        ).fetchall()
    }
    want_dl = {
        r[0]: r[1]
        for r in con.execute(
            r"""
            SELECT doc_id, len(list_filter(string_split_regex(trim(text), '\s+'),
                                           t -> t <> ''))
            FROM documents
            """
        ).fetchall()
    }
    assert got_post == want_post
    assert got_df == want_df
    assert got_dl == want_dl


def test_bm25_plan_broadcasts_query_side(spark):
    docs, queries = _frames(spark)
    plan = (
        bm25_scores(docs, queries)
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final
    # partial aggregation (map-side combine) on the scoring sum
    assert "partial_sum" in final or "HashAggregate" in final
