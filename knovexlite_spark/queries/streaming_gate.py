"""Streaming correctness corpus: Structured Streaming queries driven to
completion (availableNow -> memory sink) and checked against batch SQL
oracles — pinning that the incremental execution computes exactly the
batch semantics (Q18/Q19).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    tumbling_counts,
)

_counter = itertools.count()


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"gate_tumble_{next(_counter)}"
    run_to_memory(tumbling_counts(read_events_stream(spark, sf_dir)), name)
    return spark.table(name)


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30 min gap) per user; output
    (user_id, session_start, n_events)."""
    name = f"gate_sess_{next(_counter)}"
    run_to_memory(session_windows(read_events_stream(spark, sf_dir)), name)
    return spark.table(name).select(
        "user_id", F.col("session_start").alias("session_start"), "n_events"
    )


def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + session streaming windows in ONE tagged gate row (the
    driver records at most 50 queries — round-1 forensics).  Both streams
    run availableNow to a memory sink; results are normalized to a common
    (kind, key, t, c, s) schema and unioned."""
    tumble = q_stream_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"),
        F.col("event_type").alias("key"),
        F.col("w").alias("t"),
        F.col("c").cast("long").alias("c"),
        F.col("s"),
    )
    sess = q_stream_session(spark, sf_dir).select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("key"),
        F.col("session_start").alias("t"),
        F.col("n_events").cast("long").alias("c"),
        F.lit(None).cast("string").alias("s"),
    )
    name = f"gate_slide_{next(_counter)}"
    run_to_memory(sliding_counts(read_events_stream(spark, sf_dir)), name)
    slide = spark.table(name).select(
        F.lit("sliding").alias("kind"),
        F.col("event_type").alias("key"),
        F.col("w").alias("t"),
        F.col("c").cast("long").alias("c"),
        F.lit(None).cast("string").alias("s"),
    )
    return tumble.unionAll(sess).unionAll(slide)


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keyed-state operator (applyInPandasWithState) at the gate:
    per-user running stats streamed to a memory sink in update mode;
    the LAST update row per user (max n_events — the count is strictly
    increasing) must equal the batch aggregation.  Compared columns are
    the cross-engine-exact ones: the event count and the max (a
    passthrough double); the Python-accumulated float sum stays in the
    operator but out of the hash."""
    from pyspark.sql import Window

    from knovexlite_spark.streaming.stateful import running_user_stats

    name = f"gate_state_{next(_counter)}"
    run_to_memory(running_user_stats(read_events_stream(spark, sf_dir)), name, mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            "max_value",
        )
    )


ORACLES = {
    # keyed running state drained == batch aggregation
    "stream_stateful": """
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(value) AS max_value
        FROM events GROUP BY user_id
    """,
    # tumbling must equal the batch q18 semantics; session is the
    # gaps-and-islands formulation of 30-min-gap sessionization
    # (session_start = min ts in the island).
    "stream_windows": """
        SELECT 'tumbling' AS kind, event_type AS key,
               DATE_TRUNC('HOUR', ts) AS t,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS s
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'session' AS kind, CAST(user_id AS STRING) AS key,
               session_start AS t, CAST(n_events AS BIGINT) AS c,
               CAST(NULL AS STRING) AS s
        FROM (
            WITH flagged AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       CASE WHEN ts - LAG(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_s
                FROM events
            ),
            islands AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM flagged
            )
            SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
            FROM islands GROUP BY user_id, sess_id
        ) sessions
        UNION ALL
        -- sliding 1h windows every 30min: each event lands in the two
        -- 30-min-grid windows covering it (both engines align the grid
        -- to midnight/epoch, which coincide for 30-min buckets)
        SELECT 'sliding' AS kind, event_type AS key, w AS t,
               CAST(COUNT(*) AS BIGINT) AS c, CAST(NULL AS STRING) AS s
        FROM (
            SELECT event_type,
                   time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP)) AS w
            FROM events
            UNION ALL
            SELECT event_type,
                   time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP))
                       - INTERVAL 30 MINUTES
            FROM events
        ) sliding GROUP BY 2, 3
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stream_windows": q_stream_windows,
        "stream_stateful": q_stream_stateful,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
