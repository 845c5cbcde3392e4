"""End-to-end analytics-tier rehearsal: the sketch/rollup operators
composed into the dashboard pipeline they exist for — raw events to
per-key series, moving aggregates, percentiles, and heavy hitters —
with per-stage row counts and wall times (the curation_rehearsal
protocol: rows NEXT TO timings, marginal cost via eager
localCheckpoint, one untimed warm-up pass).

Stages (each an operator this repo ships; no ad-hoc logic).  From
round 13 the SCALE SHAPES are the PRIMARY paths and the dense/exact
forms run as the A/B (round-12 verdict stretch ask — the measured
crossings earned them the default slot):

  1. resample            ops/timeseries.resample — 15 min buckets
                         per user, ONE combinable groupBy
  2. rolling_sparse      PRIMARY moving aggregates: range frame over
                         the RAW resampled frame — observed-bucket-
                         bound, no dense grid
  3. gap_fill            the dense grid — built when fills must
                         participate (zero-counted holes, EWMA carry)
  4. rolling_ewma_dense  A/B: trailing 8-bucket aggs + EWMA over the
                         grid (adds NO exchange; cost = grid rows x
                         window cols)
  5. gk_by_key_answers   per-user p50/p95/p99 of the dense activity
                         series (the "holes counted" question needs
                         the grid by definition)
  6. gk_local_values     PRIMARY global percentile state over event
                         value cents: gk_summary_local (round-13
                         bounded-memory build — no row-sized shuffle)
  7. mg_local_per_day    PRIMARY per-day top event types:
                         mg_build_local_by_key keyed by day (round-13
                         open-vocabulary per-key build) + per-key
                         merge + top-5
  8. mg_per_day_exact    A/B: the exact-count per-day build (tight
                         bounds; right when the vocabulary is small)
  9. mg_local_top10      global bounded-memory top-10 (round 12)

Usage: python scripts/analytics_rehearsal.py [sf_dir]
Default sf_dir: /root/testdata/sf0.1.  Prints one JSON line; the
driver-facing artifact convention is artifacts/analytics_rehearsal_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops.quantile import (
    gk_quantiles_by_key,
    gk_summary_by_key,
)
from knovexlite_spark.ops.sketch import (
    mg_build,
    mg_summary_local,
    mg_summary_local_by_key,
    mg_topk,
    mg_topk_by_key,
)
from knovexlite_spark.ops.timeseries import ewma, gap_fill, resample, rolling
from knovexlite_spark.session import get_spark


def run(spark, sf_dir: str, label: str) -> dict:
    out: dict = {"corpus": label, "stages": []}
    pins: list = []

    def stage(name, df):
        t0 = time.time()
        df = df.localCheckpoint()  # eager: the stage's marginal cost
        n = df.count()
        out["stages"].append(
            {"stage": name, "rows": n, "sec": round(time.time() - t0, 2)}
        )
        if pins:
            pins[-1].unpersist()
        pins.append(df)
        return df

    ev = Engine.for_dir(spark, sf_dir).table("events")

    # 1. resample: 15 min buckets per user
    agg = stage(
        "resample_15m",
        resample(
            ev,
            "ts",
            "15m",
            ["user_id"],
            aggs=[
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast("double")).alias("sv"),
            ],
        ),
    )

    # 2. PRIMARY moving aggregates: the sparse range-frame path over
    # the RAW resampled frame — observed buckets only, no dense grid
    stage(
        "rolling_sparse",
        rolling(
            agg, ["user_id"], {"n": ["sum", "avg", "max"]}, 8,
            frame="range", stride="15m",
        ),
    )

    # 3. densify — built when fills must PARTICIPATE (zero-counted
    # holes, EWMA carry); the checkpointed input makes
    # materialize=False safe and keeps the stage cost honest
    dense = stage(
        "gap_fill",
        gap_fill(
            agg, "15m", ["user_id"], fill={"n": "zero", "sv": "ffill"},
            materialize=False,
        ),
    )

    # 4. A/B: the dense moving aggregates + EWMA (adds no exchange;
    # cost = grid rows x window columns, by definition)
    stage(
        "rolling_ewma_dense",
        ewma(
            rolling(dense, ["user_id"], {"n": ["sum", "avg", "max"]}, 8),
            ["user_id"],
            "sv",
            alpha=0.25,
            window=8,
        ),
    )

    # 5. per-user percentiles of the dense activity series (the
    # "holes counted" question needs the grid by definition)
    summ = gk_summary_by_key(dense, "user_id", "n", k_build=32, k_compress=16)
    stage(
        "gk_by_key_answers",
        gk_quantiles_by_key(summ, "user_id", [0.5, 0.95, 0.99]),
    )

    # 6. PRIMARY global percentile state over event value cents: the
    # round-13 bounded-memory build — map-only, no row-sized shuffle
    from knovexlite_spark.ops.quantile import gk_summary_local

    stage(
        "gk_local_values",
        gk_summary_local(
            ev.select(F.round(F.col("value") * 100).cast("long").alias("c")),
            "c",
            k=64,
            k_compress=32,
        ),
    )

    # 7. PRIMARY per-day top event types: the round-13 open-vocabulary
    # per-key build (dict of per-day kernel states per partition, no
    # (day, item)-sized shuffle) + per-key merge + top-5
    day = (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    keyed = ev.select(day.alias("d"), F.col("event_type").alias("item"))
    stage(
        "mg_local_per_day",
        mg_topk_by_key(
            mg_summary_local_by_key(keyed, "d", "item", m=8),
            5,
            key_cols="d",
        ),
    )

    # 8. A/B: the exact-count per-day build (tight bounds — right
    # when the vocabulary is small, as event_type is)
    pts = mg_build(keyed, "item", m=8, group_col="d")
    stage("mg_per_day_exact", mg_topk_by_key(pts, 5))

    # 9. the global bounded-memory build, top-10 (round 12)
    stage(
        "mg_local_top10",
        mg_topk(mg_summary_local(ev.select("event_type"), "event_type", m=64), 10),
    )

    out["total_sec"] = round(sum(s["sec"] for s in out["stages"]), 2)
    for p in pins:
        p.unpersist()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="analytics_rehearsal",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    # untimed warm-up (codegen, parquet footers, Arrow worker pool)
    warm0 = time.time()
    run(spark, sf_dir, "warmup")
    warm = round(time.time() - warm0, 2)
    res = run(spark, sf_dir, os.path.basename(sf_dir.rstrip("/")))
    res["warmup_total_sec"] = warm
    print(json.dumps(res))


if __name__ == "__main__":
    main()
