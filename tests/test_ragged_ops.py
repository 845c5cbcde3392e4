"""Ragged-matrix op set (A3-A15) vs hand-computed frames."""

from knovexlite_spark.ops.ragged import (
    append_rows,
    collect_rows,
    compact_row_ids,
    composite_renumber,
    distinct_within_rows,
    duplicates_within_rows,
    explode_rows,
    first_occurrence,
    grouped_reduce,
    interleave_ranges,
    sort_within_rows,
    topk_within_rows,
)

ROWS = [(0, 5.0), (0, 1.0), (0, 5.0), (2, 3.0), (2, 4.0), (7, 9.0)]


def _df(spark):
    return spark.createDataFrame(ROWS, "row_index long, value double")


def test_grouped_reduce(spark):
    got = {r["row_index"]: r["value"] for r in grouped_reduce(_df(spark), ["row_index"], "value", "max").collect()}
    assert got == {0: 5.0, 2: 4.0, 7: 9.0}


def test_sort_within_rows(spark):
    got = {(r["row_index"], r["pos"]): r["value"] for r in sort_within_rows(_df(spark)).collect()}
    assert got[(0, 0)] == 1.0 and got[(0, 1)] == 5.0 and got[(0, 2)] == 5.0
    assert got[(2, 0)] == 3.0


def test_distinct_and_duplicates(spark):
    d = {(r["row_index"], r["value"]) for r in distinct_within_rows(_df(spark)).collect()}
    assert d == {(0, 5.0), (0, 1.0), (2, 3.0), (2, 4.0), (7, 9.0)}
    dup = {(r["row_index"], r["value"]): r["n"] for r in duplicates_within_rows(_df(spark)).collect()}
    assert dup == {(0, 5.0): 2}


def test_topk_within_rows(spark):
    got = sorted((r["row_index"], r["value"]) for r in topk_within_rows(_df(spark), 1).collect())
    assert got == [(0, 5.0), (2, 4.0), (7, 9.0)]


def test_append_and_compact(spark):
    ab = append_rows(_df(spark), spark.createDataFrame([(9, 0.5)], "row_index long, value double"))
    assert ab.count() == 7
    compact = compact_row_ids(ab)
    assert {r["row_index"] for r in compact.collect()} == {0, 1, 2, 3}


def test_composite_renumber(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (1, "x")], "a long, b string"
    )
    got = composite_renumber(df, "a", "b").collect()
    ids = {(r["a"], r["b"]): r["pair_id"] for r in got}
    assert ids[(1, "x")] == 0 and ids[(1, "y")] == 1 and ids[(2, "x")] == 2


def test_dense_roundtrip(spark):
    dense = collect_rows(_df(spark))
    d = {r["row_index"]: r["values"] for r in dense.collect()}
    assert d[0] == [1.0, 5.0, 5.0]
    back = explode_rows(dense)
    assert sorted((r["row_index"], r["value"]) for r in back.collect()) == sorted(
        (a, b) for a, b in ROWS
    )


def test_interleave_ranges(spark):
    df = spark.createDataFrame([(0, 2, 5), (1, 7, 8)], "row_index long, start long, end long")
    got = sorted((r["row_index"], r["value"]) for r in interleave_ranges(df).collect())
    assert got == [(0, 2), (0, 3), (0, 4), (1, 7)]


def test_first_occurrence(spark):
    df = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "a"), (3, "c")], "pos long, value string"
    )
    got = {r["value"]: r["first_pos"] for r in first_occurrence(df).collect()}
    assert got == {"a": 0, "b": 1, "c": 3}
