"""Distributed k-means + SemDeDup (ops/cluster.py).

The float path (kmeans_fit) is property-tested against an independent
NumPy Lloyd reference; the integer-exact path (kmeans_exact /
semantic_pairs_exact — the gate form) is replayed step-for-step in pure
Python integers and must match EXACTLY, including on unseparated random
data where every float implementation would drift."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.cluster import (
    EXACT_SCALE,
    kmeans_exact,
    kmeans_fit,
    semantic_dedup,
    semantic_pairs_exact,
)


def _blobs(rng, centers, per, spread=0.05):
    """Well-separated float32 blobs: [(id, vec), ...]."""
    rows = []
    i = 0
    for c in centers:
        for _ in range(per):
            rows.append(
                (i, (np.asarray(c) + rng.normal(0, spread, len(c))).astype(np.float32))
            )
            i += 1
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _lloyd_reference(X, init, max_iter, tol=1e-4):
    """Independent NumPy Lloyd with the library's exact conventions:
    float32 distances, float64 sums/means, empty cells keep previous."""
    cent = np.asarray(init, dtype=np.float32).copy()
    for _ in range(max_iter):
        d = ((X.astype(np.float32)[:, None, :] - cent[None]) ** 2).sum(-1)
        a = d.argmin(1)
        new = cent.copy()
        for c in range(len(cent)):
            m = a == c
            if m.any():
                new[c] = (X[m].astype(np.float64).sum(0) / m.sum()).astype(np.float32)
        shift = float(np.sqrt(((new - cent) ** 2).sum(1)).max())
        cent = new
        if shift < tol:
            break
    return cent


def test_kmeans_fit_matches_numpy_lloyd(spark):
    rng = np.random.default_rng(7)
    centers = [[5, 0, 0, 0], [0, 5, 0, 0], [0, 0, 5, 0]]
    rows = _blobs(rng, centers, per=25)
    X = np.stack([v for _, v in rows])
    init = np.asarray(centers, dtype=np.float32) + 0.3
    got = kmeans_fit(_df(spark, rows), k=3, max_iter=5, init=init)
    ref = _lloyd_reference(X, init, max_iter=5)
    assert np.allclose(got, ref, atol=1e-4)
    # assignments identical on separated blobs
    da = ((X[:, None, :] - got[None]) ** 2).sum(-1).argmin(1)
    db = ((X[:, None, :] - ref[None]) ** 2).sum(-1).argmin(1)
    assert (da == db).all()


def test_kmeans_fit_objective_nonincreasing(spark):
    rng = np.random.default_rng(11)
    rows = _blobs(rng, [[3, 0], [0, 3], [-3, -3]], per=20, spread=0.5)
    X = np.stack([v for _, v in rows])
    init = np.asarray([[1.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], dtype=np.float32)

    def inertia(cent):
        return float(((X[:, None, :] - cent[None]) ** 2).sum(-1).min(1).sum())

    df = _df(spark, rows)
    prev = inertia(init)
    for it in (1, 2, 4):
        cur = inertia(kmeans_fit(df, k=3, max_iter=it, init=init, tol=0.0))
        assert cur <= prev + 1e-6
        prev = cur


def test_kmeans_fit_empty_cell_keeps_previous(spark):
    rng = np.random.default_rng(3)
    rows = _blobs(rng, [[1, 0], [0, 1]], per=10)
    far = np.asarray([1000.0, 1000.0], dtype=np.float32)
    init = np.stack([np.asarray([1.0, 0.0], dtype=np.float32),
                     np.asarray([0.0, 1.0], dtype=np.float32), far])
    got = kmeans_fit(_df(spark, rows), k=3, max_iter=2, init=init)
    assert np.allclose(got[2], far)


# -- integer-exact path ----------------------------------------------------


def _quantize(rows, scale=EXACT_SCALE):
    return {int(i): [math.floor(float(x) * scale) for x in v] for i, v in rows}


def _exact_replay(rows, k, iters, scale=EXACT_SCALE):
    """Pure-Python integer replay of kmeans_exact: init = k smallest
    ids as (s=xq, n=1); cost = int(||x*n - s||^2) / (n*n) in ONE double
    division; ties to the lowest cell; empty cells keep (s, n)."""
    xq = _quantize(rows, scale)
    ids = sorted(xq)
    cents = {c: (list(xq[i]), 1) for c, i in enumerate(ids[:k])}

    def assign():
        out = {}
        for i in ids:
            best, best_cost = None, None
            for c in sorted(cents):
                s, n = cents[c]
                num = sum((x * n - si) ** 2 for x, si in zip(xq[i], s))
                cost = num / (n * n)
                if best_cost is None or cost < best_cost:
                    best, best_cost = c, cost
            out[i] = best
        return out

    a = assign()
    for _ in range(iters):
        upd = {}
        for i, c in a.items():
            s, n = upd.get(c, ([0] * len(xq[i]), 0))
            upd[c] = ([si + x for si, x in zip(s, xq[i])], n + 1)
        cents = {c: upd.get(c, cents[c]) for c in cents}
        a = assign()
    return a


def test_kmeans_exact_matches_python_replay_on_random_data(spark):
    # UNSEPARATED random vectors — exactness may not lean on margins
    rng = np.random.default_rng(19)
    rows = [(i, rng.normal(0, 1, 8).astype(np.float32)) for i in range(120)]
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_exact(_df(spark, rows), k=4, iters=2).collect()
    }
    assert got == _exact_replay(rows, k=4, iters=2)


def test_kmeans_exact_empty_cell_keeps_previous_centroid(spark):
    # vecs 0..2 identical => init cells 1, 2 never win a point (ties go
    # to cell 0), so their (s, n) must survive via the coalesce branch
    rng = np.random.default_rng(23)
    base = rng.normal(0, 1, 4).astype(np.float32)
    rows = [(0, base), (1, base.copy()), (2, base.copy())] + [
        (i, rng.normal(0, 1, 4).astype(np.float32)) for i in range(3, 40)
    ]
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_exact(_df(spark, rows), k=4, iters=2).collect()
    }
    assert got == _exact_replay(rows, k=4, iters=2)
    # the three identical vectors always land in one cell together
    assert got[0] == got[1] == got[2]


def test_semantic_pairs_exact_matches_python_replay(spark):
    rng = np.random.default_rng(31)
    rows = [(i, rng.normal(0, 1, 8).astype(np.float32)) for i in range(60)]
    # planted scaled copies: cosine exactly ~1, same quantized direction
    rows += [(1000 + i, (v * 0.5).astype(np.float32)) for i, v in rows[:6]]
    got = {
        (r["doc_a"], r["doc_b"]): r["dot"]
        for r in semantic_pairs_exact(
            _df(spark, rows), k=4, iters=2, threshold_num=4, threshold_den=5
        ).collect()
    }
    cells = _exact_replay(rows, k=4, iters=2)
    xq = _quantize(rows)
    want = {}
    for a in sorted(xq):
        for b in sorted(xq):
            if a >= b or cells[a] != cells[b]:
                continue
            dot = sum(x * y for x, y in zip(xq[a], xq[b]))
            na = sum(x * x for x in xq[a])
            nb = sum(y * y for y in xq[b])
            if dot > 0 and 25 * dot * dot >= 16 * na * nb:
                want[(a, b)] = dot
    assert got == want
    assert want, "fixture must actually produce pairs"


def test_semantic_dedup_finds_planted_duplicates(spark):
    rng = np.random.default_rng(41)
    centers = [[4, 0, 0], [0, 4, 0], [0, 0, 4]]
    # spread 0.3 keeps within-blob cosines <= ~0.99997 while the planted
    # 1e-4-noise copies stay above 0.9999999 — the threshold separates
    # true duplicates from merely-same-topic neighbors (measured margins)
    rows = _blobs(rng, centers, per=15, spread=0.3)
    dups = [(1000 + i, v + rng.normal(0, 1e-4, 3).astype(np.float32))
            for i, v in rows[::9]]
    comp = semantic_dedup(
        _df(spark, rows + dups),
        k=3,
        threshold=0.99999,
        centroids=np.asarray(centers, dtype=np.float32),
    )
    by_doc = {r["doc"]: (r["component"], r["size"]) for r in comp.collect()}
    for i, _ in rows[::9]:
        assert by_doc[1000 + i] == (i, 2)  # canonical survivor = MIN id
    # non-duplicated docs are singletons
    dup_ids = {i for i, _ in rows[::9]}
    for i, _ in rows:
        if i not in dup_ids:
            assert by_doc[i] == (i, 1)
    # filter(doc == component) IS the dedup
    kept = comp.filter(F.col("doc") == F.col("component")).count()
    assert kept == len(rows)


def test_semantic_dedup_probes2_recovers_boundary_straddlers(spark):
    # near-identical pair placed symmetrically across the c0/c1 border:
    # probes=1 splits them into different cells (pair invisible),
    # probes=2 assigns both to both cells and finds it
    cents = np.asarray([[1, 0, 0], [-1, 0, 0]], dtype=np.float32)
    rows = [
        (0, np.asarray([0.001, 1, 0], dtype=np.float32)),
        (1, np.asarray([-0.001, 1, 0], dtype=np.float32)),
        (2, np.asarray([1.5, 0.2, 0], dtype=np.float32)),
        (3, np.asarray([-1.5, -0.2, 0], dtype=np.float32)),
    ]
    df = _df(spark, rows)
    one = semantic_dedup(df, k=2, threshold=0.99, centroids=cents, probes=1)
    assert {r["size"] for r in one.collect()} == {1}
    two = semantic_dedup(df, k=2, threshold=0.99, centroids=cents, probes=2)
    by_doc = {r["doc"]: (r["component"], r["size"]) for r in two.collect()}
    assert by_doc[0] == (0, 2) and by_doc[1] == (0, 2)
    assert by_doc[2] == (2, 1) and by_doc[3] == (3, 1)


def test_semantic_dedup_quantized_matches_float_on_planted_dups(spark):
    """Round-8 stretch #8 A/B: the int8 qvec path (assign dequantizes
    per batch; the per-cell GEMM runs on raw qvecs — positive scales
    cancel in cosine) returns the SAME components and survivor set as
    the float path on a planted-duplicate corpus."""
    from knovexlite_spark.ops.similarity import quantize_embeddings

    rng = np.random.default_rng(61)
    rows = [(i, rng.normal(0, 1, 16).astype(np.float32)) for i in range(60)]
    rows += [(500 + i, v + rng.normal(0, 1e-5, 16).astype(np.float32))
             for i, v in rows[:8]]
    df = _df(spark, rows)
    cent = np.stack([rng.normal(0, 1, 16) for _ in range(4)]).astype(np.float32)
    fl = sorted(
        map(tuple, semantic_dedup(
            df, k=4, threshold=0.99, centroids=cent, probes=2
        ).collect())
    )
    qdf = quantize_embeddings(df).select(
        "vec_id", F.col("qvec").alias("embedding"), "scale"
    )
    qu = sorted(
        map(tuple, semantic_dedup(
            qdf, k=4, threshold=0.99, centroids=cent, probes=2,
            quantized=True,
        ).collect())
    )
    assert fl == qu
    # the 8 planted pairs are all found in both paths
    sizes = {doc: size for doc, comp, size in fl}
    assert sum(1 for doc, comp, size in fl if size == 2) == 16
    assert all(sizes[500 + i] == 2 for i, _ in rows[:8])
    # quantized=True without float-space centroids is a loud error
    with pytest.raises(ValueError, match="centroids"):
        semantic_dedup(qdf, k=4, threshold=0.99, quantized=True)


def test_semantic_dedup_deterministic_across_runs(spark):
    rng = np.random.default_rng(53)
    rows = [(i, rng.normal(0, 1, 6).astype(np.float32)) for i in range(80)]
    rows += [(500 + i, v) for i, v in rows[:10]]
    df = _df(spark, rows).repartition(7)
    cent = np.asarray([rng.normal(0, 1, 6) for _ in range(4)], dtype=np.float32)
    a = sorted(map(tuple, semantic_dedup(df, k=4, threshold=0.98, centroids=cent).collect()))
    b = sorted(map(tuple, semantic_dedup(df, k=4, threshold=0.98, centroids=cent).collect()))
    assert a == b and len(a) == 90


def test_semantic_pairs_exact_plan_no_cartesian(spark):
    rng = np.random.default_rng(61)
    rows = [(i, rng.normal(0, 1, 8).astype(np.float32)) for i in range(50)]
    plan = semantic_pairs_exact(_df(spark, rows), k=4, iters=1)._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    # the only nested-loop join is the broadcast of the k-row centroids
    assert "BroadcastNestedLoopJoin" in final


def test_semantic_dedup_probes_validation(spark):
    rng = np.random.default_rng(67)
    rows = [(i, rng.normal(0, 1, 4).astype(np.float32)) for i in range(5)]
    with pytest.raises(ValueError, match="probes"):
        semantic_dedup(_df(spark, rows), k=2, probes=0,
                       centroids=np.zeros((2, 4), dtype=np.float32))
