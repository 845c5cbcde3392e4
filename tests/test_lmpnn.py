"""LMPNN structural invariants (no golden floats — SURVEY §5.4)."""

import numpy as np

from knovexlite_spark.functions.kge import EmbeddingStore, TransE
from knovexlite_spark.reasoner.lmpnn import LMPNN, build_query_graph_frames

N, D = 12, 6


def _setup(spark, instances):
    store = EmbeddingStore.xavier(N, 4, D, seed=5)
    nodes, edges = build_query_graph_frames(spark, instances)
    return LMPNN(model=TransE(), store=store), nodes, edges


def test_scores_dense_and_deterministic(spark):
    inst = [(0, "r1(s1,f)", {"r1": 0, "s1": 3}), (1, "r1(s1,e1)&r2(e1,f)", {"r1": 0, "r2": 2, "s1": 5})]
    lm, nodes, edges = _setup(spark, inst)
    s1 = lm.eval_all_entity_scores(nodes, edges).collect()
    s2 = lm.eval_all_entity_scores(nodes, edges).collect()
    assert len(s1) == 2 * N  # dense per query
    d1 = {(r["query_id"], r["t"]): r["score"] for r in s1}
    d2 = {(r["query_id"], r["t"]): r["score"] for r in s2}
    for k in d1:
        assert np.isclose(d1[k], d2[k], atol=1e-6)
    # cosine range
    assert all(-1.000001 <= v <= 1.000001 for v in d1.values())


def test_negation_changes_messages(spark):
    pos = [(0, "r1(s1,f)", {"r1": 0, "s1": 3})]
    neg = [(0, "r1(s1,e1)&!r2(s2,f)&r3(e1,f)", {"r1": 0, "r2": 2, "r3": 0, "s1": 3, "s2": 4})]
    lm, n1, e1 = _setup(spark, pos)
    _, n2, e2 = _setup(spark, neg)
    a = {r["t"]: r["score"] for r in lm.eval_all_entity_scores(n1, e1).collect()}
    b = {r["t"]: r["score"] for r in lm.eval_all_entity_scores(n2, e2).collect()}
    assert any(not np.isclose(a[t], b[t], atol=1e-6) for t in a)


def test_disjunction_scores_are_max_of_clauses(spark):
    # (r1(s1,f)) | (r2(s2,f)) must equal elementwise max of the two
    # single-clause runs
    bindings = {"r1": 0, "r2": 2, "s1": 3, "s2": 7}
    lm, n_u, e_u = _setup(spark, [(0, "r1(s1,f)|r2(s2,f)", bindings)])
    _, n_a, e_a = _setup(spark, [(0, "r1(s1,f)", bindings)])
    _, n_b, e_b = _setup(spark, [(0, "r2(s2,f)", bindings)])
    u = {r["t"]: r["score"] for r in lm.eval_all_entity_scores(n_u, e_u).collect()}
    a = {r["t"]: r["score"] for r in lm.eval_all_entity_scores(n_a, e_a).collect()}
    b = {r["t"]: r["score"] for r in lm.eval_all_entity_scores(n_b, e_b).collect()}
    for t in u:
        assert np.isclose(u[t], max(a[t], b[t]), atol=1e-5)
