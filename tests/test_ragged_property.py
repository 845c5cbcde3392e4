"""Property tests for the ragged (VariadicMatrix-equivalent) operators
against plain-Python references on hypothesis-generated ragged frames.

One example = one randomly shaped ragged frame driven through several
operators at once (each Spark action costs ~100 ms, so examples are
batched and few — the generator favors the shapes that break ragged
code: empty rows absent, singleton rows, all-equal values, negatives).
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from knovexlite_spark.ops.ragged import (
    distinct_within_rows,
    duplicates_within_rows,
    first_occurrence,
    grouped_reduce,
    sort_within_rows,
    topk_within_rows,
)

ragged = st.lists(
    st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=8),
    min_size=1,
    max_size=6,
)


def _df(spark, rows):
    data = [(i, v) for i, vs in enumerate(rows) for v in vs]
    return spark.createDataFrame(data, "row_index long, value long")


@settings(max_examples=10, deadline=None)
@given(rows=ragged)
def test_rowwise_ops_match_python_reference(spark, rows):
    df = _df(spark, rows)

    got_sort = [
        r["value"]
        for r in sort_within_rows(df).orderBy("row_index", "value").collect()
    ]
    want_sort = [v for vs in rows for v in sorted(vs)]
    assert got_sort == want_sort

    got_distinct = {
        (r["row_index"], r["value"]) for r in distinct_within_rows(df).collect()
    }
    want_distinct = {(i, v) for i, vs in enumerate(rows) for v in set(vs)}
    assert got_distinct == want_distinct

    got_dups = {
        (r["row_index"], r["value"]) for r in duplicates_within_rows(df).collect()
    }
    want_dups = {
        (i, v)
        for i, vs in enumerate(rows)
        for v, c in Counter(vs).items()
        if c > 1
    }
    assert got_dups == want_dups

    k = 3
    got_topk = {}
    for r in topk_within_rows(df, k).collect():
        got_topk.setdefault(r["row_index"], []).append(r["value"])
    for i, vs in enumerate(rows):
        want = sorted(vs, reverse=True)[:k]
        assert sorted(got_topk[i], reverse=True) == want


@settings(max_examples=10, deadline=None)
@given(rows=ragged)
def test_grouped_reduce_matches_python_reference(spark, rows):
    df = _df(spark, rows)
    for how in ("sum", "max", "min"):
        got = {
            r["row_index"]: r["value"]
            for r in grouped_reduce(df, ["row_index"], "value", how).collect()
        }
        fn = {"sum": sum, "max": max, "min": min}[how]
        want = {i: fn(vs) for i, vs in enumerate(rows)}
        assert got == want, how


@settings(max_examples=10, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=5), min_size=1, max_size=12
    )
)
def test_first_occurrence_matches_python_reference(spark, vals):
    df = spark.createDataFrame(
        [(v, i) for i, v in enumerate(vals)], "value long, pos long"
    )
    got = {r["value"]: r["first_pos"] for r in first_occurrence(df).collect()}
    want = {}
    for i, v in enumerate(vals):
        want.setdefault(v, i)
    assert got == want
