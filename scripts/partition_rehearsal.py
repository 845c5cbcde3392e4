"""Partition-pruning rehearsal (round 6): the time-partitioned layout
every 100-TB event store uses, measured.

Writes the events table date-partitioned (`partitionBy(event_date)`),
then runs a one-day windowed aggregation against the partitioned and
the flat layout:

- the partitioned plan must contain a PartitionFilters entry on
  event_date (asserted — pruning happens at PLANNING time, before any
  file is opened), and the scan's file count collapses to the one
  day's files;
- the flat layout reads every row-group and prunes per-row.

At sf0.1 both are fast; the transferable evidence is the pruned scan
(`numFiles` ~ days_selected / days_total of the corpus) — at 100 TB
with daily partitions, a one-day query reads ~1/365th of the bytes by
construction, which no row-level filter pushdown can match.

Usage: python scripts/partition_rehearsal.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knovexlite_spark.engine import Engine  # noqa: E402
from knovexlite_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/events_by_day.parquet"


def one_day_agg(events, day):
    return (
        events.filter(F.col("event_date") == F.lit(day))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("s"),
        )
    )


def _rest_input_totals(spark) -> tuple[int, int]:
    """(records, bytes) read across all completed stages."""
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    return (
        sum(s.get("inputRecords", 0) for s in stages),
        sum(s.get("inputBytes", 0) for s in stages),
    )


def main() -> None:
    spark = get_spark(
        app_name="partition_rehearsal",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4059"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    ev = Engine.for_dir(spark, SRC).table("events").withColumn(
        "event_date", F.to_date("ts")
    )
    t0 = time.time()
    shutil.rmtree(DST, ignore_errors=True)
    ev.write.mode("overwrite").partitionBy("event_date").parquet(DST)
    write_s = round(time.time() - t0, 2)

    part = spark.read.parquet(DST)
    days = [r["event_date"] for r in part.select("event_date").distinct().collect()]
    day = sorted(days)[len(days) // 2]

    pruned = one_day_agg(part, day)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    if "PartitionFilters" not in plan or "event_date" not in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0]:
        raise AssertionError(f"no partition filter on event_date:\n{plan}")

    flat = one_day_agg(ev, day)

    def timed(df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    # warm both, then measure scan input via the REST stage metrics
    timed(pruned)
    timed(flat)
    r0, b0 = _rest_input_totals(spark)
    timed(pruned)
    r1, b1 = _rest_input_totals(spark)
    timed(flat)
    r2, b2 = _rest_input_totals(spark)

    n_dirs_total = len(
        [p for p in os.listdir(DST) if p.startswith("event_date=")]
    )
    res = {
        "partition_write_s": write_s,
        "n_days": len(days),
        "day": str(day),
        "partition_dirs_total": n_dirs_total,
        "input_records_pruned": r1 - r0,
        "input_records_flat": r2 - r1,
        "input_mb_pruned": round((b1 - b0) / 1e6, 2),
        "input_mb_flat": round((b2 - b1) / 1e6, 2),
        "pruned_s": [timed(pruned) for _ in range(3)],
        "flat_s": [timed(flat) for _ in range(3)],
        "rows_match": pruned.count() == flat.count(),
    }
    if not res["rows_match"]:
        raise AssertionError("partitioned and flat results disagree")
    if res["input_records_pruned"] * 2 > res["input_records_flat"]:
        raise AssertionError(
            "partition pruning did not reduce scan input: "
            f"{res['input_records_pruned']} vs {res['input_records_flat']}"
        )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
