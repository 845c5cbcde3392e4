"""Dataset loading: parquet tables per scale-factor dir + temp views.

Scans stay declarative (``spark.read.parquet``) so Catalyst gets filter
pushdown / column pruning / partition pruning for free — at 100 TB these
are the difference between reading a column slice and reading the lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from knovexlite_spark.schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # The driver has shipped two parquet layouts for event time, so
    # normalize both to a session-tz TIMESTAMP in the scan projection:
    #  - TIMESTAMP(NANOS) arrives as an epoch-nanos long (session.py
    #    nanosAsLong); floor-division matches DuckDB's ns->us truncation.
    #  - TIMESTAMP(isAdjustedToUTC=false) arrives as TIMESTAMP_NTZ; the
    #    session tz is pinned to UTC so the cast is value-preserving.
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TESTDATA_TABLES
) -> dict[str, DataFrame]:
    """Load every table and register it as a temp view for Spark SQL."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
