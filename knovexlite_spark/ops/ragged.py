"""Ragged-matrix operation set (SURVEY §2.4 A3-A15).

The reference's ``VariadicMatrix`` (1-D data tensor + parallel row_index,
/root/reference/knovex/utils/data.py:112-396) IS a long-format DataFrame
``(row_index, value)``; every VM op is a groupBy/Window/generator
expression here.  This module exists so each §2.4 inventory line has a
named, tested operator:

  A3  aggregation(scatter reduce)   -> grouped_reduce
  A4  sort_                         -> sort_within_rows
  A5  unique_consecutive_           -> distinct_within_rows
  A6  multiple_consecutive_         -> duplicates_within_rows
  A7  topk_index                    -> topk_within_rows
  A8  append                        -> append_rows (unionByName)
  A9  reindex_                      -> compact_row_ids
  A10 refine_index                  -> composite_renumber
  A11 to_dense / from_dense         -> collect_rows / explode_rows
  A12 interleave_arange             -> interleave_ranges
  A13 first_unique_idx              -> first_occurrence
  A15 tensorize_batch_entities      -> (createDataFrame + explode_rows)

Window-based per-row ops partition by row_index — rows are independent,
so these scale with the number of rows regardless of raggedness; no
dense padding ever materializes (SURVEY §4.2 "stay long-format").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grouped_reduce(df: DataFrame, keys: list[str], value: str, how: str) -> DataFrame:
    """A3: scatter-reduce by key (data.py:399-426)."""
    agg = {"sum": F.sum, "max": F.max, "min": F.min, "mean": F.avg}[how]
    return df.groupBy(*keys).agg(agg(value).alias(value))


def sort_within_rows(df: DataFrame, descending: bool = False) -> DataFrame:
    """A4: per-row sort (data.py:220-235) — emits (row_index, value,
    pos) with pos the within-row sorted position."""
    order = F.col("value").desc() if descending else F.col("value").asc()
    w = Window.partitionBy("row_index").orderBy(order)
    return df.select(
        "row_index", "value", (F.row_number().over(w) - 1).alias("pos")
    )


def distinct_within_rows(df: DataFrame) -> DataFrame:
    """A5: per-row dedup (data.py:237-260)."""
    return df.select("row_index", "value").dropDuplicates(["row_index", "value"])


def duplicates_within_rows(df: DataFrame) -> DataFrame:
    """A6: keep only values repeated within their row (data.py:262-281);
    emits (row_index, value, n)."""
    return (
        df.groupBy("row_index", "value")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


def topk_within_rows(df: DataFrame, k: int, descending: bool = True) -> DataFrame:
    """A7: per-row top-k (data.py:325-337; the beam prune of
    cqd.py:374-409)."""
    order = F.col("value").desc() if descending else F.col("value").asc()
    w = Window.partitionBy("row_index").orderBy(order, "value")
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("row_index", "value")
    )


def append_rows(a: DataFrame, b: DataFrame) -> DataFrame:
    """A8: row-aligned append (data.py:370-375)."""
    return a.unionByName(b)


def compact_row_ids(df: DataFrame) -> DataFrame:
    """A9: compress row ids to 0..n-1 (data.py:387-396)."""
    w = Window.orderBy("row_index")
    ids = df.select("row_index").distinct().select(
        "row_index", (F.dense_rank().over(w) - 1).alias("new_row")
    )
    return df.join(ids, "row_index").select(
        F.col("new_row").alias("row_index"), *[c for c in df.columns if c != "row_index"]
    )


def composite_renumber(df: DataFrame, a: str, b: str) -> DataFrame:
    """A10: same id iff BOTH keys equal (data.py:91-109)."""
    w = Window.orderBy(a, b)
    ids = df.select(a, b).distinct().select(
        a, b, (F.dense_rank().over(w) - 1).alias("pair_id")
    )
    return df.join(ids, [a, b])


def collect_rows(df: DataFrame) -> DataFrame:
    """A11 to_dense without the padding: (row_index, values ARRAY) —
    the dense form only for row-local consumption, never padded."""
    return df.groupBy("row_index").agg(F.sort_array(F.collect_list("value")).alias("values"))


def explode_rows(df: DataFrame, values_col: str = "values") -> DataFrame:
    """A11 from_dense / A15 input normalization."""
    return df.select("row_index", F.explode(values_col).alias("value"))


def interleave_ranges(df: DataFrame, start: str = "start", end: str = "end") -> DataFrame:
    """A12: concatenated aranges [start, end) per row (data.py:69-88)."""
    return df.select(
        "row_index",
        F.explode(F.sequence(F.col(start), F.col(end) - 1)).alias("value"),
    )


def first_occurrence(df: DataFrame, value: str = "value", pos: str = "pos") -> DataFrame:
    """A13: first index at which each value appears
    (pyg_graph_functionals.py:11-24)."""
    return df.groupBy(value).agg(F.min(pos).alias("first_pos"))
