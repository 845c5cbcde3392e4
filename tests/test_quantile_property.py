"""Property-based (hypothesis) tests for the pure-Python GK quantile
kernels (ops/quantile.py py_gk_*) — the algebra under the streaming
keyed state and the exact reference the DataFrame operators are
tested against.  Pure Python, no Spark session.

Invariants (exact, at every stage):
- build points are exact order statistics (rmin == rmax, the rank
  really is the value's rank), and rank n is always kept (rollup
  property: a summary's item count is recoverable as max rmax);
- after merging ANY random partition of the multiset into sources,
  every bracket still contains a valid rank of its value:
  rmin <= count(<= v) and rmax >= count(< v) + 1, and max rmax == n;
- compress only drops points (survivors keep their brackets) and
  keeps both ends;
- a rank query's answer lands within the documented
  n/k_build + n/k_compress budget of its target rank.
"""

from __future__ import annotations

import bisect
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from knovexlite_spark.ops.quantile import (
    py_gk_build,
    py_gk_compress,
    py_gk_merge,
    py_gk_query,
)

values = st.lists(
    st.integers(min_value=0, max_value=30), min_size=1, max_size=150
)
ks = st.integers(min_value=2, max_value=10)


def _bracket_ok(points, vals):
    svals = sorted(vals)
    for v, rmin, rmax in points:
        lt = bisect.bisect_left(svals, v)
        le = bisect.bisect_right(svals, v)
        assert le > lt, f"value {v} not in the multiset"
        assert rmin <= le, (v, rmin, le)
        assert rmax >= lt + 1, (v, rmax, lt + 1)


@given(values, ks)
@settings(max_examples=200, deadline=None)
def test_build_points_are_exact_order_statistics(vals, k):
    pts = py_gk_build(vals, k)
    svals = sorted(vals)
    n = len(svals)
    for v, rmin, rmax in pts:
        assert rmin == rmax
        assert svals[rmin - 1] == v
    assert max(p[2] for p in pts) == n  # rank n always kept
    assert min(p[1] for p in pts) == 1  # rank 1 always kept


@given(values, ks, st.integers(min_value=1, max_value=5))
@settings(max_examples=200, deadline=None)
def test_merge_of_any_partition_keeps_brackets(vals, k, n_src):
    parts = [[] for _ in range(n_src)]
    for i, v in enumerate(vals):
        parts[i % n_src].append(v)
    merged = py_gk_merge([py_gk_build(p, k) for p in parts if p])
    _bracket_ok(merged, vals)
    assert max(p[2] for p in merged) == len(vals)


@given(values, ks, ks, st.integers(min_value=1, max_value=4))
@settings(max_examples=150, deadline=None)
def test_compress_drops_only_and_query_budget(vals, k_b, k_c, n_src):
    parts = [[] for _ in range(n_src)]
    for i, v in enumerate(vals):
        parts[i % n_src].append(v)
    merged = py_gk_merge([py_gk_build(p, k_b) for p in parts if p])
    comp = py_gk_compress(merged, k_c)
    assert set(comp) <= set(merged)  # drops, never rewrites
    _bracket_ok(comp, vals)
    n = len(vals)
    assert comp[0] == merged[0] and comp[-1] == merged[-1]  # ends kept
    assert max(p[2] for p in comp) == n
    # documented rank-error budget ~ n/k_build (merge bracket width)
    # + n/k_compress (band gap), with a small absolute floor
    svals = sorted(vals)
    tol = max(4, n // k_b + n // k_c)
    for f in (0.0, 0.5, 0.9, 1.0):
        [ans] = py_gk_query(comp, [f])
        target = max(1, int(math.ceil(f * n)))
        lt = bisect.bisect_left(svals, ans)
        le = bisect.bisect_right(svals, ans)
        # the answer's rank range must come within tol of the target
        dist = 0 if lt + 1 <= target <= le else min(
            abs(lt + 1 - target), abs(le - target)
        )
        assert dist <= tol, (f, ans, target, (lt + 1, le), tol, n)


# -- the bounded-memory cascade kernels (round 13) ---------------------------


@given(values, ks, st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_fast_merge_equals_reference_merge(vals, k, n_src):
    """py_gk_merge_fast is the bisect-accelerated twin the local
    build's cascade runs — it must equal py_gk_merge POINT-FOR-POINT
    on any partition of any multiset."""
    from knovexlite_spark.ops.quantile import py_gk_merge_fast

    parts = [[] for _ in range(n_src)]
    for i, v in enumerate(vals):
        parts[i % n_src].append(v)
    summaries = [py_gk_build(p, k) for p in parts if p]
    assert py_gk_merge_fast(summaries) == py_gk_merge(summaries)


@given(
    values,
    ks,
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=150, deadline=None)
def test_cascade_keeps_brackets_for_any_chunking(vals, k, chunk, fan):
    """PyGkCascade (the per-partition local-build state) keeps exact
    bracketing, the rollup rank, and both extremes for ANY chunking
    and fan — the layout-independent half of the gk_build_local
    contract; only bracket WIDTH may vary with layout."""
    from knovexlite_spark.ops.quantile import PyGkCascade

    casc = PyGkCascade(k, fan)
    for i in range(0, len(vals), chunk):
        casc.add(vals[i : i + chunk])
    pts = casc.finish()
    _bracket_ok(pts, vals)
    assert max(p[2] for p in pts) == len(vals)
    assert pts[0][0] == min(vals) and pts[-1][0] == max(vals)


@given(values, ks)
@settings(max_examples=200, deadline=None)
def test_fast_build_equals_reference_build(vals, k):
    """py_gk_build_fast (the cascade's vectorized chunk kernel) must
    equal py_gk_build POINT-FOR-POINT."""
    from knovexlite_spark.ops.quantile import py_gk_build_fast

    assert py_gk_build_fast(vals, k) == py_gk_build(vals, k)


w_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=-2, max_value=9),
    ),
    min_size=1,
    max_size=120,
)


@given(w_pairs, ks)
@settings(max_examples=200, deadline=None)
def test_weighted_fast_build_equals_reference(pairs, k):
    """py_gk_build_weighted_fast (the cascade's weighted chunk
    kernel) must equal the pure-Python reference POINT-FOR-POINT —
    including the non-positive-weight drops."""
    from knovexlite_spark.ops.quantile import (
        py_gk_build_weighted,
        py_gk_build_weighted_fast,
    )

    want = py_gk_build_weighted(pairs, k)
    got = py_gk_build_weighted_fast(
        [v for v, _ in pairs], [w for _, w in pairs], k
    )
    assert got == want


@given(w_pairs, ks)
@settings(max_examples=200, deadline=None)
def test_weighted_build_brackets_valid_on_expanded_multiset(pairs, k):
    """A weight-w pair counts as w unit rows: the weighted build's
    points must bracket exactly in the weight-EXPANDED multiset, with
    max rmax == the total weight."""
    from knovexlite_spark.ops.quantile import py_gk_build_weighted

    pts = py_gk_build_weighted(pairs, k)
    expanded = [v for v, w in pairs if w > 0 for _ in range(w)]
    if not expanded:
        assert pts == []
        return
    _bracket_ok(pts, expanded)
    assert max(p[2] for p in pts) == len(expanded)


@given(
    w_pairs,
    ks,
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=2, max_value=4),
)
@settings(max_examples=100, deadline=None)
def test_weighted_cascade_keeps_brackets(pairs, k, chunk, fan):
    """The cascade with weighted chunks keeps exact bracketing and
    the rollup rank over the weight-expanded union, for any chunking."""
    from knovexlite_spark.ops.quantile import PyGkCascade

    casc = PyGkCascade(k, fan)
    for i in range(0, len(pairs), chunk):
        sl = pairs[i : i + chunk]
        casc.add([v for v, _ in sl], weights=[w for _, w in sl])
    pts = casc.finish()
    expanded = [v for v, w in pairs if w > 0 for _ in range(w)]
    if not expanded:
        assert pts == []
        return
    _bracket_ok(pts, expanded)
    assert max(p[2] for p in pts) == len(expanded)
