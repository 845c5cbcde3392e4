"""End-to-end analytics-tier rehearsal: the sketch/rollup operators
composed into the dashboard pipeline they exist for — raw events to
per-key series, moving aggregates, percentiles, and heavy hitters —
with per-stage row counts and wall times (the curation_rehearsal
protocol: rows NEXT TO timings, marginal cost via eager
localCheckpoint, one untimed warm-up pass).

Stages (each an operator this repo ships; no ad-hoc logic):

  1. resample        ops/timeseries.resample — 15 min buckets per
                     user, ONE combinable groupBy(user, bucket)
  2. gap_fill        ops/timeseries.gap_fill — densify (zero counts,
                     ffill value sums); the spine-size guard rides
                     the bounds aggregation (round-12 cap)
  3. rolling + ewma  ops/timeseries.rolling/ewma — trailing 8-bucket
                     sum/avg/max + span-windowed EWMA per user, NO
                     new exchange (chains onto the fill windows)
  4. per-key gk      ops/quantile.gk_summary_by_key +
                     gk_quantiles_by_key — p50/p95/p99 of the DENSE
                     per-user activity series (zeros included: the
                     quantiles describe the filled series, which is
                     the dashboard question "how active is this user
                     per 15 min, holes counted")
  5. heavy hitters   ops/sketch.mg_build + mg_topk_by_key — top
                     event types PER DAY window with error bounds
                     (the "what was hot yesterday" panel)
  6. mg local        ops/sketch.mg_summary_local — the round-12
                     bounded-memory build over the same event-type
                     stream, global top-10 (A/B against stage 5's
                     exact-count build shape)

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
from knovexlite_spark.ops.sketch import mg_build, mg_summary_local, mg_topk, mg_topk_by_key
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

    # 2. densify (the checkpointed input makes materialize=False safe
    # and keeps the stage cost honest — one pass, not bounds + probe
    # re-derivations)
    dense = stage(
        "gap_fill",
        gap_fill(
            agg, "15m", ["user_id"], fill={"n": "zero", "sv": "ffill"},
            materialize=False,
        ),
    )

    # 3. moving aggregates: trailing 2 h (8 buckets) + EWMA
    rolled = stage(
        "rolling_ewma",
        ewma(
            rolling(dense, ["user_id"], {"n": ["sum", "avg", "max"]}, 8),
            ["user_id"],
            "sv",
            alpha=0.25,
            window=8,
        ),
    )

    # 3b. the sparse fast path: the same time window over the RAW
    # resampled frame — output is observed buckets, not the grid
    stage(
        "rolling_sparse",
        rolling(
            agg, ["user_id"], {"n": ["sum", "avg", "max"]}, 8,
            frame="range", stride="15m",
        ),
    )

    # 4. per-user percentiles of the dense activity series
    summ = gk_summary_by_key(dense, "user_id", "n", k_build=32, k_compress=16)
    stage(
        "gk_by_key_answers",
        gk_quantiles_by_key(summ, "user_id", [0.5, 0.95, 0.99]),
    )

    # 5. heavy hitters per day window (exact-count build: event_type
    # cardinality is small, the tight-bound form is the right one)
    day = (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("long")
    pts = mg_build(
        ev.select(F.col("event_type").alias("item"), day.alias("d")),
        "item",
        m=8,
        group_col="d",
    )
    stage("mg_per_day_topk", mg_topk_by_key(pts, 5))

    # 6. the bounded-memory build over the same stream, global top-10
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
