"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query executes fully via the `noop` sink (no driver collect, no
result materialization skew).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knovexlite_spark.session import get_spark  # noqa: E402


def headline_queries():
    """name -> callable(spark, sf_dir) -> DataFrame. Chosen to cover the
    engine's surfaces: scan/filter, multiway join, grouped agg, window
    top-k, event windows, EFO chain/cyclic joins, pipeline ops."""
    from knovexlite_spark.queries import registry

    all_q = registry.queries()
    names = [
        "q1_filter_project",
        "q3_multiway_join",
        "q7_grouped_agg",
        "q11_topk_window",
        "q23_local_supplier_revenue",
        "q12_window_frame",
        "q18_tumbling_window",
        "cq_paths",
        "cq9_samenation",
    ]
    # pipeline/reasoning ops register themselves once implemented
    for extra in (
        "dedup_exact",
        "dedup_minhash",
        "text_quality",
        "ann_topk",
        "lang_id",
    ):
        if extra in all_q:
            names.append(extra)
    return {n: all_q[n] for n in names if n in all_q}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="knovexlite_bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footers once so timings measure queries,
    # not session bring-up (the first query otherwise pays ~5s).
    from knovexlite_spark.engine import Engine

    warm = Engine.for_dir(spark, sf_dir)
    for t in warm.tables.values():
        t.limit(1).count()

    timings: dict[str, float] = {}
    for name, fn in headline_queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
