"""Structured Streaming batch/stream parity on the events table."""

import pytest
from pyspark.sql import functions as F

from knovexlite_spark.datasets import load_table
from knovexlite_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_batch(spark):
    return load_table(spark, SF_SMALL, "events").cache()


def _stream(spark):
    return read_events_stream(spark, SF_SMALL)


def test_tumbling_stream_equals_batch(spark, events_batch):
    run_to_memory(tumbling_counts(_stream(spark)), "t_tumble")
    got = {
        (r["w"], r["event_type"]): (r["c"], r["s"])
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = (
        events_batch.groupBy(
            F.date_trunc("HOUR", "ts").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("string").alias("s"),
        )
        .collect()
    )
    want = {(r["w"], r["event_type"]): (r["c"], r["s"]) for r in batch}
    assert got == want


def test_sliding_stream_covers_tumbling(spark, events_batch):
    run_to_memory(sliding_counts(_stream(spark)), "t_slide")
    rows = spark.sql("SELECT * FROM t_slide").collect()
    # every event lands in exactly 2 sliding windows (1h window, 30m slide)
    assert sum(r["c"] for r in rows) == 2 * events_batch.count()


def test_session_stream_equals_lag_sessionization(spark, events_batch):
    run_to_memory(session_windows(_stream(spark)), "t_sess")
    n_sessions = spark.sql("SELECT COUNT(*) AS n FROM t_sess").collect()[0]["n"]
    events_total = spark.sql("SELECT SUM(n_events) AS s FROM t_sess").collect()[0]["s"]
    # batch twin: a session starts where the gap to the previous event
    # exceeds 30 minutes (Q19 semantics)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch_sessions = (
        events_batch.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("prev").isNull()
                | (
                    F.col("ts").cast("long") - F.col("prev").cast("long")
                    > 30 * 60
                ),
                1,
            ).otherwise(0),
        )
        .agg(F.sum("new_s"))
        .collect()[0][0]
    )
    assert n_sessions == batch_sessions
    assert events_total == events_batch.count()


def test_custom_stateful_operator_batch_parity(spark, events_batch):
    """applyInPandasWithState keyed state: after the source drains, the
    last emitted row per user equals the batch aggregation."""
    from knovexlite_spark.streaming.stateful import running_user_stats

    out = running_user_stats(_stream(spark))
    q = (
        out.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    got = spark.sql(
        "SELECT user_id, MAX(n_events) AS n, MAX(total_value) AS s, MAX(max_value) AS m "
        "FROM t_state GROUP BY user_id"
    ).toPandas()
    want = (
        events_batch.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.max("value").alias("m"),
        )
        .toPandas()
    )
    g = got.sort_values("user_id", ignore_index=True)
    w = want.sort_values("user_id", ignore_index=True)
    assert g["user_id"].tolist() == w["user_id"].tolist()
    assert g["n"].tolist() == w["n"].tolist()
    assert all(abs(a - b) < 1e-6 for a, b in zip(g["s"], w["s"]))
    assert g["m"].tolist() == w["m"].tolist()
