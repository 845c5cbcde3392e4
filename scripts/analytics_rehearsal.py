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
 10. skew_exact_by_key   SKEW rehearsal (round 14): zipf keys, one
                         key = 50% of rows — the windowed exact build
                         sorts the hot key's half-corpus in ONE task
 11. skew_local_by_key   the per-partition local build: the hot key
                         summarizes in place, no task exceeds its
                         partition
 12. profile_incremental INCREMENTAL corpus profile (round 14):
                         reload day 1's persisted profile, build day
                         2, profile_union — no day-1 rescan
 13. profile_rebuild     A/B: the full rebuild over day1 ∪ day2
 14. profilek_incremental PER-KEY incremental profile (round 15):
                         reload day 1's per-event-type profile, build
                         day 2 per key, profile_union(key_cols=) — the
                         daily per-language workflow, keys intact
 15. profilek_rebuild    A/B: the full per-key rebuild over day1 ∪ day2

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

    # 10/11. SKEW rehearsal (round 14, verdict #5): zipf-keyed per-key
    # quantiles with ONE key owning 50% of all rows (the hot-URL /
    # hot-tenant shape).  The windowed exact build's only row-sized
    # pass is a per-(key, src) sort window — the hot key's half of the
    # corpus sorts in ONE task; the local build summarizes the hot
    # key's rows IN PLACE per partition (a dict entry like any other),
    # so no task ever holds more than its partition.  64 cold keys
    # keep the summary frame summary-sized, isolating SKEW (the
    # key-cardinality trade is stage 7/8's story).
    from knovexlite_spark.ops.quantile import gk_summary_local_by_key

    skewed = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("event_id") % 64).cast("string")))
        .alias("key"),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    stage(
        "skew_exact_by_key",
        gk_summary_by_key(skewed, "key", "c", k_build=32, k_compress=16),
    )
    stage(
        "skew_local_by_key",
        gk_summary_local_by_key(skewed, "key", "c", k=32, k_compress=16),
    )

    # 12/13. INCREMENTAL corpus profile (round 14, verdict #4): day 1's
    # one-pass profile persists to parquet (sketch_save), day 2 builds
    # fresh, profile_union merges WITHOUT rescanning day 1 — vs the
    # full rebuild over day1 ∪ day2.  The incremental stage's input is
    # day 2 + a KB-sized reload; the rebuild rescans everything, which
    # at 100 TB is the entire point of mergeable sketches.
    import tempfile

    from knovexlite_spark.ops.persist import sketch_load, sketch_save
    from knovexlite_spark.ops.profile import profile_local, profile_union

    half = (F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast(
        "long"
    ) % 2
    pe = ev.filter(F.col("ts").isNotNull()).select(
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("event_type").alias("etype"),
        F.col("user_id").cast("string").alias("uid"),
        half.alias("__half"),
    )
    day1, day2 = pe.filter(F.col("__half") == 0), pe.filter(F.col("__half") == 1)
    kw = dict(
        quantile_cols=["cents"], item_cols=["etype"],
        distinct_cols=["uid"], k=64, m=64, p=10,
    )
    pdir = tempfile.mkdtemp(prefix="rehearsal_profile_")
    t0 = time.time()
    sketch_save(profile_local(day1, **kw), f"{pdir}/day1", "profile")
    p1, _ = sketch_load(spark, f"{pdir}/day1", expect_family="profile")
    out["stages"].append(
        {"stage": "profile_day1_save", "rows": p1.count(),
         "sec": round(time.time() - t0, 2)}
    )
    stage(
        "profile_incremental",
        profile_union(p1, profile_local(day2, **kw)),
    )
    stage("profile_rebuild", profile_local(pe, **kw))

    # 14/15. PER-KEY incremental corpus profile (round 15, verdict #1):
    # the production "daily per-language profile" workflow — day 1's
    # PER-EVENT-TYPE profile persists (sketch_save), day 2 builds
    # fresh per key, profile_union(key_cols=) merges with the
    # nest-safe dense re-tag and the key columns INTACT (the unkeyed
    # form now raises on a keyed frame instead of silently dropping
    # keys) — vs the full per-key rebuild over day1 ∪ day2.
    from knovexlite_spark.ops.profile import profile_local_by_key

    pk = ev.filter(F.col("ts").isNotNull()).select(
        F.col("event_type").alias("lang"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.col("user_id").cast("string").alias("uid"),
        half.alias("__half"),
    )
    kday1 = pk.filter(F.col("__half") == 0).drop("__half")
    kday2 = pk.filter(F.col("__half") == 1).drop("__half")
    kkw = dict(quantile_cols=["cents"], distinct_cols=["uid"], k=32, p=8)
    t0 = time.time()
    sketch_save(
        profile_local_by_key(kday1, "lang", **kkw),
        f"{pdir}/kday1",
        "profile",
        params={"k": 32, "p": 8},
    )
    kp1, kmeta = sketch_load(spark, f"{pdir}/kday1", expect_family="profile")
    out["stages"].append(
        {"stage": "profilek_day1_save", "rows": kp1.count(),
         "sec": round(time.time() - t0, 2)}
    )
    stage(
        "profilek_incremental",
        profile_union(
            kp1,
            profile_local_by_key(kday2, "lang", **kkw),
            key_cols="lang",
            metas=[kmeta, {"k": 32, "p": 8}],
        ),
    )
    stage(
        "profilek_rebuild",
        profile_local_by_key(pk.drop("__half"), "lang", **kkw),
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
