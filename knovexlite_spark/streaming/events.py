"""Structured Streaming over the events table (SURVEY §2.9 gap surface):
watermarked tumbling / sliding / session windows and a stateful
session-count operator.

Batch/stream parity is the design invariant: every streaming
transformation here has the same semantics as its batch twin (Q18/Q19),
which is what the tests pin (run the stream from a file source, compare
the complete output against the batch aggregation).

Scale notes: watermark + windowed aggregation is incremental state in
the state store, partitioned by group key — the 100 TB shape is
(event-time partitioned source) -> (keyed state) -> (append sink);
nothing here collects unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one file = one
    micro-batch replay of history; in production this is Kafka/files
    arriving).  File streams require a DIRECTORY source, and the events
    table ships in two layouts: a single ``events.parquet`` FILE
    (driver-generated testdata — stream the sf dir filtered to that
    filename) or a Spark-written ``events.parquet/`` DIRECTORY of
    part-files (e.g. the scale-rehearsal blow-up — stream the directory
    itself; a filename glob would match zero part-files and SILENTLY
    yield an empty stream, which is how the round-4 rehearsal caught
    this).

    readStream needs an explicit schema, so take it from the batch
    footer: parquet TIMESTAMP(NANOS) data arrives as an epoch-nanos
    long (session.py nanosAsLong) and is converted here, TIMESTAMP
    (micros) data arrives as a native timestamp — same dual handling
    as the batch loader (datasets.py)."""
    import os

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
    if os.path.isdir(path):
        raw = reader.parquet(path)
    else:
        raw = reader.option("pathGlobFilter", "events.parquet").parquet(sf_dir)
    if isinstance(schema["ts"].dataType, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (with-tz); the session tz is
        # pinned to UTC, so the cast is value-preserving wall-clock
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(
    events: DataFrame, window_len: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Q18 streaming twin: watermarked tumbling window counts + sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len).alias("w"), "event_type")
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )
        .select(F.col("w").start.alias("w"), "event_type", "c", F.col("s").cast("string").alias("s"))
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_len, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("c"))
        .select(F.col("w").start.alias("w"), "event_type", "c")
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Q19 streaming twin: native session windows (gap-based) per user —
    the stateful sessionization operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w").start.alias("session_start"),
            F.col("w").end.alias("session_end"),
            "n_events",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup at ingest — the streaming twin of
    ops/dedup.exact_duplicates: watermarked
    ``dropDuplicatesWithinWatermark`` keeps one row per key and DROPS
    the key's state once the watermark passes its event time.  That
    bound is the 100-TB point: state is O(keys inside the watermark
    horizon), not O(stream length) — a plain ``dropDuplicates`` on an
    unbounded stream holds every key ever seen and OOMs the state
    store.  Duplicates arriving within the horizon (the at-least-once
    redelivery window of any real source) are removed; replays older
    than the horizon are the source's responsibility, as with any
    watermarked operator."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_to_memory(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a stream to the in-memory sink until the source drains;
    returns the query handle (results via spark.sql(f"select * from
    {name}"))."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
