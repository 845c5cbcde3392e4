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
