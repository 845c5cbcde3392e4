"""SparkSession factory.

Defaults are tuned for correctness-first local runs but the knobs are the
ones that matter at cluster scale: AQE on (runtime re-planning, skew-join
splitting, shuffle-partition coalescing), Arrow on (every pandas_udf /
mapInPandas crossing is vectorized), UTC session time so results are
reproducible across engines (the DuckDB oracle runs in UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "knovexlite_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default all cores);
    shuffle partitions default to the same so a local run has one shuffle
    task per core.  On a real cluster, pass ``master=None`` and size
    ``shuffle_partitions`` to ~2-3x total executor cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: coalesce post-shuffle partitions, split skewed joins,
        # convert sort-merge to broadcast when runtime stats allow.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every Python<->JVM batch crossing (pandas_udf etc).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic cross-engine timestamps (DuckDB oracle is UTC).
        .config("spark.sql.session.timeZone", "UTC")
        # Testdata `events.ts` is parquet TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, loader converts to micros.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # ANSI off: TPC-H-ish data is clean; keep permissive casts.
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
