"""Sink/source surface: partitioned parquet writes (partition pruning),
bucketed tables (shuffle-free co-located joins — the SCALE.md triples
layout), JSON round-trip."""

from pyspark.sql import functions as F

from knovexlite_spark.datasets import load_table
from tests.conftest import SF_SMALL


def test_partitioned_write_prunes(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem")
    out = str(tmp_path / "li_part")
    li.write.partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert back.count() == want
    # partition pruning: the filtered scan must read only the R partition
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or want == 0


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both join sides on the key removes the Exchange —
    the co-located join strategy SCALE.md prescribes for the triples
    table."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckets LOCATION '{tmp_path}/wh'")
    orders = load_table(spark, SF_SMALL, "orders")
    li = load_table(spark, SF_SMALL, "lineitem")
    orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").mode("overwrite").saveAsTable(
        "buckets.o_b"
    )
    li.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable(
        "buckets.l_b"
    )
    # disable broadcast so the planner exercises the bucketed SMJ path
    # (at test scale everything fits a broadcast otherwise)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("buckets.o_b").join(
            spark.table("buckets.l_b"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        n = joined.count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join should not shuffle"
        assert n == orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")


def test_json_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF_SMALL, "events").limit(100)
    out = str(tmp_path / "ev_json")
    ev.write.json(out)
    back = spark.read.json(out)
    assert back.count() == 100
    assert set(back.columns) == set(ev.columns)
