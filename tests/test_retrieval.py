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


RANKED_A = [  # (query_id, doc_id, rn) — "lexical" list
    (10, 1, 1), (10, 3, 2), (10, 2, 3),
    (11, 2, 1), (11, 1, 2),
]
RANKED_B = [  # "dense" list; query 11 absent entirely
    (10, 3, 1), (10, 4, 2), (10, 1, 3),
]


def _rrf_reference(lists, k=60):
    out = {}
    for lst in lists:
        for q, d, r in lst:
            out[(q, d)] = out.get((q, d), 0.0) + 1.0 / (k + r)
    return out


def test_rrf_fuse_matches_python_reference(spark):
    from knovexlite_spark.ops.retrieval import rrf_fuse

    a = spark.createDataFrame(RANKED_A, "query_id long, doc_id long, rn long")
    b = spark.createDataFrame(RANKED_B, "query_id long, doc_id long, rn long")
    rows = rrf_fuse([a, b], k=60).collect()
    got = {(r["query_id"], r["doc_id"]): r for r in rows}
    want = _rrf_reference([RANKED_A, RANKED_B])
    assert set(got) == set(want)
    for key, s in want.items():
        assert got[key]["rrf_score"] == pytest.approx(s, rel=1e-12)
    # doc 3 (ranks 2+1) and doc 1 (ranks 1+3) both dual-list; doc 3's
    # 1/62+1/61 > doc 1's 1/61+1/63 — fused order q10: 3, 1, then the
    # single-list docs 2 (rank 3) < 4 (rank 2) by rrf
    order_q10 = [
        r["doc_id"] for r in sorted(rows, key=lambda r: r["fused_rank"])
        if r["query_id"] == 10
    ]
    assert order_q10 == [3, 1, 4, 2]
    assert got[(10, 3)]["n_lists"] == 2 and got[(10, 4)]["n_lists"] == 1
    # query 11 fuses from the single available list, order preserved
    order_q11 = [
        r["doc_id"] for r in sorted(rows, key=lambda r: r["fused_rank"])
        if r["query_id"] == 11
    ]
    assert order_q11 == [2, 1]


def test_rrf_fuse_replays_exactly_in_duckdb(spark):
    """The integer-scaled fusion (rrf_scaled = sum of RRF_SCALE div
    (k+rn)) and the fused ranking replay bit-for-bit in DuckDB on the
    same candidate lists — the engine-independent verdict the float
    score can't give (the no-gate-slot pattern)."""
    from knovexlite_spark.ops.retrieval import rrf_fuse

    a = spark.createDataFrame(RANKED_A, "query_id long, doc_id long, rn long")
    b = spark.createDataFrame(RANKED_B, "query_id long, doc_id long, rn long")
    got = sorted(
        (r["query_id"], r["doc_id"], r["rrf_scaled"], r["fused_rank"])
        for r in rrf_fuse([a, b], k=60).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE a (query_id BIGINT, doc_id BIGINT, rn BIGINT)")
    con.execute("CREATE TABLE b (query_id BIGINT, doc_id BIGINT, rn BIGINT)")
    con.executemany("INSERT INTO a VALUES (?, ?, ?)", RANKED_A)
    con.executemany("INSERT INTO b VALUES (?, ?, ?)", RANKED_B)
    want = sorted(
        map(
            tuple,
            con.execute(
                """
                WITH u AS (SELECT * FROM a UNION ALL SELECT * FROM b),
                f AS (
                    SELECT query_id, doc_id,
                           SUM(1000000000 // (60 + rn)) AS rrf_scaled
                    FROM u GROUP BY 1, 2
                )
                SELECT query_id, doc_id, rrf_scaled,
                       ROW_NUMBER() OVER (
                           PARTITION BY query_id
                           ORDER BY rrf_scaled DESC, doc_id
                       ) AS fused_rank
                FROM f
                """
            ).fetchall(),
        )
    )
    assert got == want


def test_rrf_fuse_hybrid_end_to_end_and_plan(spark):
    """Fuse real BM25 + a synthetic dense list over the fixture docs:
    a document ranked by both lists must outrank single-list documents
    with comparable ranks, out_k truncates, and the whole fusion runs
    on ONE exchange (hash on query_id serves the groupBy AND the
    window)."""
    from knovexlite_spark.ops.retrieval import rrf_fuse

    docs, queries = _frames(spark)
    lexical = bm25_topk(docs, queries, k=3).select("query_id", "doc_id", "rn")
    dense = spark.createDataFrame(
        # query 10: doc 3 top dense hit, doc 4 second (doc 4 is lexical-absent)
        [(10, 3, 1), (10, 4, 2), (11, 2, 1)],
        "query_id long, doc_id long, rn long",
    )
    out = rrf_fuse([lexical, dense], k=60, out_k=2)
    rows = out.collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: r["fused_rank"]):
        by_q.setdefault(r["query_id"], []).append(r["doc_id"])
    assert all(len(v) <= 2 for v in by_q.values())
    # doc 3 is in both lists for q10 — it must lead the fused ranking
    assert by_q[10][0] == 3
    assert by_q[11][0] == 2
    # plan pin on the fusion in ISOLATION (the end-to-end plan also
    # contains bm25's own scorer exchanges): ONE exchange, hash on
    # query_id alone — the subset key serves both the (query, doc)
    # aggregation and the re-rank window; no composite exchange.
    import re

    iso = rrf_fuse(
        [
            spark.createDataFrame(RANKED_A, "query_id long, doc_id long, rn long"),
            spark.createDataFrame(RANKED_B, "query_id long, doc_id long, rn long"),
        ],
        k=60,
        out_k=2,
    )
    iso.collect()
    final = (
        iso._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("Exchange hashpartitioning") == 1
    assert re.search(r"hashpartitioning\(query_id#\d+L?, \d+\)", final)
    assert not re.search(r"hashpartitioning\(query_id#\d+L?, doc_id", final)


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


from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _ranked_lists(draw):
    """2-3 ranked lists over a small (query, doc) space: per query and
    list, a permutation prefix of candidate docs with 1-based ranks."""
    n_lists = draw(st.integers(2, 3))
    queries = draw(st.lists(st.integers(0, 3), min_size=1, max_size=3,
                            unique=True))
    lists = []
    for _ in range(n_lists):
        rows = []
        for q in queries:
            docs = draw(st.lists(st.integers(0, 9), min_size=0, max_size=6,
                                 unique=True))
            rows += [(q, d, r + 1) for r, d in enumerate(docs)]
        lists.append(rows)
    return lists


@settings(max_examples=15, deadline=None)
@given(lists=_ranked_lists())
def test_rrf_fuse_property_matches_python(spark, lists):
    """For ANY small family of ranked lists, rrf_fuse's scores match
    the Python reference and fused_rank orders by the exact integer
    image desc with doc_id tie-break."""
    from knovexlite_spark.ops.retrieval import RRF_SCALE, rrf_fuse

    frames = [
        spark.createDataFrame(
            rows or [(99, 99, 1)], "query_id long, doc_id long, rn long"
        )
        for rows in lists
    ]
    eff = [rows or [(99, 99, 1)] for rows in lists]
    rows = rrf_fuse(frames, k=60).collect()
    got = {(r["query_id"], r["doc_id"]): r for r in rows}
    want = _rrf_reference(eff)
    want_int = {}
    for lst in eff:
        for q, d, r in lst:
            want_int[(q, d)] = want_int.get((q, d), 0) + RRF_SCALE // (60 + r)
    assert set(got) == set(want)
    for key in want:
        assert got[key]["rrf_score"] == pytest.approx(want[key], rel=1e-12)
        assert got[key]["rrf_scaled"] == want_int[key]
    # fused_rank is dense 1..n per query, ordered by (scaled desc, doc)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["rrf_scaled"], r["doc_id"]) for r in rs]
        assert keys == sorted(keys)


from hypothesis import given, settings
from hypothesis import strategies as st

_cand = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 8), st.integers(1, 12)),
    min_size=1, max_size=10,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(max_examples=12, deadline=None)
@given(_cand, _cand)
def test_rrf_fuse_list_order_invariant(spark, la, lb):
    """Property: fusion is symmetric in its input lists — [a, b] and
    [b, a] give identical (score, scaled, rank) per (query, doc)."""
    from knovexlite_spark.ops.retrieval import rrf_fuse

    a = spark.createDataFrame(la, "query_id long, doc_id long, rn long")
    b = spark.createDataFrame(lb, "query_id long, doc_id long, rn long")
    key = lambda rows: sorted(
        (r["query_id"], r["doc_id"], r["rrf_scaled"], r["fused_rank"])
        for r in rows
    )
    assert key(rrf_fuse([a, b]).collect()) == key(rrf_fuse([b, a]).collect())


@settings(max_examples=12, deadline=None)
@given(_cand)
def test_rrf_fuse_single_list_preserves_ranking(spark, la):
    """Property: fusing ONE list is a no-op on its per-query order
    (1e9 div (60+rn) is strictly decreasing over realistic depths)."""
    from knovexlite_spark.ops.retrieval import rrf_fuse

    a = spark.createDataFrame(la, "query_id long, doc_id long, rn long")
    fused = rrf_fuse([a]).collect()
    by_q = {}
    for q, d, rn in la:
        by_q.setdefault(q, []).append((rn, d))
    for r in fused:
        want_order = [d for _, d in sorted(by_q[r["query_id"]])]
        assert want_order[r["fused_rank"] - 1] == r["doc_id"]
