"""Property-based (hypothesis) tests for the pure-Python Misra-Gries
kernels (ops/sketch.py py_mg_*) — the algebra under mg_build_local's
chunk->merge chain and the streaming keyed state.  Pure Python, no
Spark session: hypothesis explores random multisets, random chunk
boundaries, and random merge-tree shapes, shrinking any failure to a
minimal counterexample.

Invariants (the public Misra-Gries / mergeable-summaries contract):
- build: <= m rows; for every kept item cnt <= true <= cnt + err;
  every dropped item's true count <= err; err is the (m+1)-th largest
  exact count (0 when the vocabulary fits).
- any fold of chunk summaries through py_mg_merge keeps bracket +
  coverage against the UNION multiset, and the total error respects
  the classic mergeable bound err <= N/(m+1) (Agarwal et al. 2012 —
  the bound mg_build_local's docstring claims per partition).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from knovexlite_spark.ops.sketch import (
    py_mg_build,
    py_mg_build_weighted,
    py_mg_merge,
)

# small alphabets force heavy collisions; sizes stay tiny so shrinks
# are readable and the suite stays fast
items = st.lists(
    st.integers(min_value=0, max_value=12).map(lambda i: f"w{i}"),
    min_size=0,
    max_size=120,
)
ms = st.integers(min_value=1, max_value=6)


def _check_invariants(table, err, truth: Counter, m: int):
    assert len(table) <= m
    kept = {it for it, _ in table}
    for it, cnt in table:
        assert 0 <= cnt <= truth[it] <= cnt + err, (it, cnt, truth[it], err)
    for it, c in truth.items():
        if it not in kept:
            assert c <= err, (it, c, err)


@given(items, ms)
@settings(max_examples=200, deadline=None)
def test_build_invariants_and_exact_threshold(xs, m):
    table, err = py_mg_build(xs, m)
    truth = Counter(xs)
    _check_invariants(table, err, truth, m)
    ranked = sorted(truth.values(), reverse=True)
    want_err = ranked[m] if len(ranked) > m else 0
    assert err == want_err
    # tie carriers: a non-empty multiset always keeps >= 1 row (the
    # round-11 uniform-source soundness rule)
    if xs:
        assert table


@given(items, ms, st.data())
@settings(max_examples=200, deadline=None)
def test_chunked_fold_keeps_brackets_and_classic_bound(xs, m, data):
    """Random chunk boundaries + a left fold through py_mg_merge —
    exactly mg_build_local's per-partition loop.  Bracket/coverage
    hold against the union, and err <= N/(m+1) (the mergeable bound
    the operator documents)."""
    # random partition of xs into chunks (possibly empty tail chunks)
    n = len(xs)
    n_cuts = data.draw(st.integers(min_value=0, max_value=min(5, n)))
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    chunks, prev = [], 0
    for c in cuts + [n]:
        chunks.append(xs[prev:c])
        prev = c
    state = None
    for ch in chunks:
        t = py_mg_build(ch, m)
        if not t[0] and t[1] == 0:
            continue
        state = t if state is None else py_mg_merge([state, t], m)
    truth = Counter(xs)
    if state is None:
        assert not truth
        return
    table, err = state
    _check_invariants(table, err, truth, m)
    assert err * (m + 1) <= len(xs), (err, m, len(xs))


@given(items, ms, st.data())
@settings(max_examples=100, deadline=None)
def test_multiway_merge_any_grouping(xs, m, data):
    """k-way merges in one shot (the merge-tree round shape: every
    batch merged at once, not pairwise) keep the same invariants."""
    n_parts = data.draw(st.integers(min_value=1, max_value=4))
    parts = [[] for _ in range(n_parts)]
    for i, x in enumerate(xs):
        parts[i % n_parts].append(x)
    tables = [py_mg_build(p, m) for p in parts if p]
    if not tables:
        return
    table, err = py_mg_merge(tables, m)
    _check_invariants(table, err, Counter(xs), m)
    # one k-way level: err = sum(build errs) + one re-trim, each term
    # <= N/(m+1) -> 2N/(m+1); this is the per-level argument behind
    # the 'mgl_acc' gate's 3N/(m+1) two-level bound
    assert err * (m + 1) <= 2 * len(xs), (err, m, len(xs))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8).map(lambda i: f"w{i}"),
            st.integers(min_value=-2, max_value=5),
        ),
        max_size=60,
    ),
    ms,
)
@settings(max_examples=200, deadline=None)
def test_weighted_build_equals_expanded_unit_rows(pairs, m):
    """A weight-w pair == w unit rows (non-positive weights drop), so
    the weighted kernel must equal py_mg_build of the expansion."""
    expanded = [it for it, w in pairs for _ in range(max(0, w))]
    assert py_mg_build_weighted(pairs, m) == py_mg_build(expanded, m)
