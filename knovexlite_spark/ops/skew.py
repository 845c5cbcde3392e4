"""Skew-mitigation operators: salted aggregation and salted broadcast
join (SURVEY brief: 'skewed keys hurt ... salting for skew').

AQE's skew-join splitting (enabled in session.py) handles most cases at
runtime; these explicit forms are for the two shapes AQE cannot fix:

- a grouped aggregation where ONE key dominates (AQE can't split a
  hash-agg group): two-phase salted aggregation spreads the hot key
  over `n_salts` partial groups, then combines.
- a shuffle join against a small-but-not-tiny dim where one probe key
  dominates: replicate the dim across salts so the hot key's rows land
  on n_salts tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) combine.  Supported aggs: sum, count, max, min
    (decomposable).  aggs is a list of (column, fn); count uses '*'."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))

    partial_exprs = []
    combine_exprs = []
    for col, fn in aggs:
        name = f"{fn}_{col}".replace("*", "all")
        if fn == "count":
            partial_exprs.append(F.count("*" if col == "*" else col).alias(name))
            combine_exprs.append(F.sum(name).cast("long").alias(name))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(name))
            combine_exprs.append(F.sum(name).alias(name))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(name))
            combine_exprs.append(F.max(name).alias(name))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(name))
            combine_exprs.append(F.min(name).alias(name))
        else:
            raise ValueError(f"non-decomposable agg: {fn}")
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*combine_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Replicate the small side across n_salts and salt the big side's
    key so one hot join key spreads over n_salts tasks.  Equivalent to
    big.join(small, on, how) for inner/left joins."""
    salts = big.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    small_rep = small.crossJoin(salts)
    big_salted = big.withColumn("__salt", (F.rand(seed=7) * n_salts).cast("int"))
    out = big_salted.join(small_rep, [on, "__salt"], how)
    return out.drop("__salt")
