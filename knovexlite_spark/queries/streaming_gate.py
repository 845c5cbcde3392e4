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


ORACLES = {
    # identical semantics to q18 (stream must equal batch)
    "stream_tumbling": """
        SELECT DATE_TRUNC('HOUR', ts) AS w, event_type,
               COUNT(*) AS c,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS s
        FROM events GROUP BY 1, 2
    """,
    # gaps-and-islands formulation of gap-based sessionization: a session
    # starts when the gap to the previous event exceeds 30 minutes;
    # session_start = min ts in the island (q19's semantics, aggregated)
    "stream_session": """
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
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stream_tumbling": q_stream_tumbling,
        "stream_session": q_stream_session,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
