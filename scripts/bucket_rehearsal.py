"""Bucketed co-located join rehearsal (round 6).

SCALE.md claims bucketing as the 100-TB answer for repeated big-big
joins (lineitem ⋈ orders is the bench's one inherent shuffle, q23).
This script MEASURES that claim instead of asserting it:

- writes orders and lineitem from sf0.1 as parquet tables bucketed by
  the join key (same bucket count both sides, sorted within buckets),
- runs the join + aggregation against the plain parquet tables and
  against the bucketed tables, with auto-broadcast DISABLED (the
  100-TB regime: neither side broadcastable),
- asserts from the physical plan that the bucketed join has NO
  Exchange on either join side (bucket pruning of the shuffle), then
  reports walls for both forms plus the one-time bucketing write cost.

The wall delta understates the cluster win: local[32] shuffles
through memory/disk on one box, while a real cluster pays the network
for every shuffled byte — the plan shape (zero exchanges before the
join) is the transferable evidence.

Usage: python scripts/bucket_rehearsal.py [n_buckets] (default 16)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knovexlite_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
WH = "/tmp/bucket_wh"
N_BUCKETS = int(sys.argv[1]) if len(sys.argv) > 1 else 16


def the_join(spark, orders, lineitem):
    """q23's core: the one inherent big-big shuffle of the bench."""
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderdate")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
    )


def timed(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    shutil.rmtree(WH, ignore_errors=True)
    spark = get_spark(
        app_name="bucket_rehearsal",
        extra_conf={
            "spark.sql.warehouse.dir": WH,
            # the 100-TB regime: neither join side is broadcastable
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.driver.extraJavaOptions": "-Xms8g -XX:+AlwaysPreTouch",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    orders_raw = spark.read.parquet(f"{SRC}/orders.parquet")
    lineitem_raw = spark.read.parquet(f"{SRC}/lineitem.parquet")

    t0 = time.time()
    (
        orders_raw.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem_raw.write.mode("overwrite")
        .bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    bucket_write_s = round(time.time() - t0, 2)

    orders_b = spark.table("orders_b")
    lineitem_b = spark.table("lineitem_b")

    plain_plan = (
        the_join(spark, orders_raw, lineitem_raw)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    bucket_plan = (
        the_join(spark, orders_b, lineitem_b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )

    def exchanges_before_join(plan: str) -> int:
        # count exchanges in the join subtree (everything below the
        # final aggregation pair) — the aggregation's own exchange is
        # inherent in both forms
        join_part = plan.split("SortMergeJoin", 1)[-1]
        return join_part.count("Exchange hashpartitioning")

    assert "SortMergeJoin" in bucket_plan
    n_ex_bucket = exchanges_before_join(bucket_plan)
    n_ex_plain = exchanges_before_join(plain_plan)
    if n_ex_bucket != 0:
        raise AssertionError(
            f"bucketed join still exchanges ({n_ex_bucket}):\n{bucket_plan}"
        )
    if n_ex_plain < 2:
        raise AssertionError(
            f"plain join expected 2 exchanges, saw {n_ex_plain}"
        )

    # correctness cross-check, then warm timing (bench protocol)
    a = the_join(spark, orders_raw, lineitem_raw).agg(
        F.count("*"), F.sum("n")
    ).collect()[0]
    b = the_join(spark, orders_b, lineitem_b).agg(
        F.count("*"), F.sum("n")
    ).collect()[0]
    assert tuple(a) == tuple(b), (a, b)

    timed(the_join(spark, orders_raw, lineitem_raw))  # warm-up
    timed(the_join(spark, orders_b, lineitem_b))
    plain = [timed(the_join(spark, orders_raw, lineitem_raw)) for _ in range(3)]
    bucket = [timed(the_join(spark, orders_b, lineitem_b)) for _ in range(3)]

    print(
        json.dumps(
            {
                "n_buckets": N_BUCKETS,
                "bucket_write_s": bucket_write_s,
                "join_exchanges_plain": n_ex_plain,
                "join_exchanges_bucketed": n_ex_bucket,
                "plain_s": plain,
                "bucketed_s": bucket,
            }
        )
    )


if __name__ == "__main__":
    main()
