"""Salted aggregation/join equivalence on a skewed dataset."""

from pyspark.sql import functions as F

from knovexlite_spark.ops.skew import salted_agg, salted_join


def _skewed(spark):
    # key 0 holds 90% of rows
    hot = spark.range(900).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    rest = spark.range(100).select((F.col("id") % 7 + 1).cast("long").alias("k"), F.col("id").alias("v"))
    return hot.unionByName(rest)


def test_salted_agg_equivalent(spark):
    df = _skewed(spark)
    plain = {
        (r["k"]): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["count_all"], r["sum_v"], r["max_v"])
        for r in salted_agg(
            df, ["k"], [("*", "count"), ("v", "sum"), ("v", "max")], 8
        ).collect()
    }
    assert plain == salted


def test_salted_join_equivalent(spark):
    big = _skewed(spark)
    dim = spark.createDataFrame([(k, f"name{k}") for k in range(8)], "k long, name string")
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in big.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"]) for r in salted_join(big, dim, "k", 8).collect()
    )
    assert plain == salted
