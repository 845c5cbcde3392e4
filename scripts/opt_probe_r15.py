"""Round-15 optimization probes: stage decomposition of the heaviest
bench rows (guide §1 — measure first, isolate with the noop sink).

Each probe times a PREFIX of a heavy row's pipeline so the deltas
attribute cost to individual stages.  3 timed iterations after 2
warm-ups, min + median reported, one JSON blob to stdout/artifact.

Usage: python scripts/opt_probe_r15.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knovexlite_spark.engine import Engine  # noqa: E402
from knovexlite_spark.session import get_spark  # noqa: E402

WARM = 2
ITERS = 3


def _time(spark, name, fn, sf_dir, out):
    spark.sparkContext.setJobDescription(f"probe:{name}")
    try:
        for _ in range(WARM):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(ITERS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {
            "iters": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
        }
        print(f"  {name:40s} min {min(ts):6.3f} med {statistics.median(ts):6.3f}", flush=True)
    finally:
        spark.sparkContext.setJobDescription(None)


# --- ts tier ---------------------------------------------------------------

def _ev_agg(spark, sf_dir):
    """resample only (the combinable groupBy)."""
    from knovexlite_spark.ops.timeseries import resample

    ev = Engine.for_dir(spark, sf_dir).table("events")
    return resample(
        ev, "ts", "15m", ["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("double")).alias("sv"),
        ],
    )


def _ev_dense(spark, sf_dir):
    """resample + gap_fill (the ts_resample row shape, double sv)."""
    from knovexlite_spark.ops.timeseries import resample_gap_fill

    ev = Engine.for_dir(spark, sf_dir).table("events")
    return resample_gap_fill(
        ev, "ts", "15m", ["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("double")).alias("sv"),
        ],
        fill={"n": "zero", "sv": "ffill"},
    )


def _ev_dense_nofill(spark, sf_dir):
    """resample + spine + join, fills left NULL (no window)."""
    from knovexlite_spark.ops.timeseries import resample_gap_fill

    ev = Engine.for_dir(spark, sf_dir).table("events")
    return resample_gap_fill(
        ev, "ts", "15m", ["user_id"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("double")).alias("sv"),
        ],
        fill={"n": None, "sv": None},
    )


def _ev_roll(spark, sf_dir):
    """dense + rolling (no ewma)."""
    from knovexlite_spark.ops.timeseries import rolling

    return rolling(_ev_dense(spark, sf_dir), ["user_id"], {"n": ["sum", "avg", "max"]}, 8)


def _ev_roll_ewma(spark, sf_dir):
    """the full ts_rolling row."""
    from knovexlite_spark.ops.timeseries import ewma

    return ewma(_ev_roll(spark, sf_dir), ["user_id"], "sv", alpha=0.25, window=8)


def _ev_ewma_only(spark, sf_dir):
    """dense + ewma (no rolling)."""
    from knovexlite_spark.ops.timeseries import ewma

    return ewma(_ev_dense(spark, sf_dir), ["user_id"], "sv", alpha=0.25, window=8)


# --- pagerank tier ---------------------------------------------------------

def _pr_prep(spark, sf_dir):
    """edge+outdeg materialization + node spine only (0 steps)."""
    from knovexlite_spark.ops.graph import pagerank

    engine = Engine.for_dir(spark, sf_dir)
    return pagerank(engine.triples.select("h", "t"), iterations=0)


def _pr_1(spark, sf_dir):
    from knovexlite_spark.ops.graph import pagerank

    engine = Engine.for_dir(spark, sf_dir)
    return pagerank(engine.triples.select("h", "t"), iterations=1)


def _pr_5(spark, sf_dir):
    from knovexlite_spark.ops.graph import pagerank

    engine = Engine.for_dir(spark, sf_dir)
    return pagerank(engine.triples.select("h", "t"), iterations=5)


# --- gk per-key tier -------------------------------------------------------

def _gklk_src(spark, sf_dir):
    li = Engine.for_dir(spark, sf_dir).table("lineitem").select(
        F.pmod(F.col("l_partkey"), F.lit(1024)).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    return li


def _gklk_build(spark, sf_dir):
    """local per-key build only (mapInPandas, no merge)."""
    from knovexlite_spark.ops.quantile import gk_build_local_by_key

    return gk_build_local_by_key(
        _gklk_src(spark, sf_dir).repartition(32), "key", "cents", k=64
    )


def _gklk_full(spark, sf_dir):
    """the full gk_local_by_key row."""
    from knovexlite_spark.ops.quantile import (
        gk_quantiles_by_key,
        gk_summary_local_by_key,
    )

    summ = gk_summary_local_by_key(
        _gklk_src(spark, sf_dir).repartition(32), "key", "cents",
        k=64, k_compress=32, fan_in=16,
    )
    return gk_quantiles_by_key(summ, "key", [0.5, 0.95, 0.99])


# --- semantic dedup tier ---------------------------------------------------

def _sem_full(spark, sf_dir):
    from knovexlite_spark.queries.pipeline import _semantic_dedup_bench

    return _semantic_dedup_bench(spark, sf_dir)


_SEM_CENT: dict = {}


def _sem_nofit(spark, sf_dir):
    """semantic_dedup with precomputed centroids (fit once, cached) —
    isolates assign + per-cell pair GEMM + closure; full-row minus
    this = the kmeans_fit driver loop."""
    from knovexlite_spark.ops.cluster import kmeans_fit, semantic_dedup
    from knovexlite_spark.queries.pipeline import _emb_semsrc

    d = _emb_semsrc(spark, sf_dir)
    if sf_dir not in _SEM_CENT:
        _SEM_CENT[sf_dir] = kmeans_fit(d, 8, max_iter=3)
    return semantic_dedup(
        d, k=8, threshold=0.95, max_iter=3, centroids=_SEM_CENT[sf_dir]
    )


# --- clf tier --------------------------------------------------------------

def _clf_full(spark, sf_dir):
    from knovexlite_spark.queries.pipeline import _clf_score_bench

    return _clf_score_bench(spark, sf_dir)


def _clf_score_only(spark, sf_dir):
    """broadcast-model scoring pass only (weights trained once, cached)."""
    from knovexlite_spark.ops.classifier import classify
    from knovexlite_spark.queries.pipeline import _docs

    key = "__clf_cached"
    cache = globals().setdefault("_CLF_W", {})
    d = _docs(spark, sf_dir).select("doc_id", "text")
    if key not in cache:
        from knovexlite_spark.ops.classifier import train_quality_classifier

        pos = d.filter(F.col("doc_id") % 100 == 0)
        neg = d.filter(F.col("doc_id") % 100 == 50)
        cache[key] = train_quality_classifier(pos, neg, n_buckets=1 << 14, epochs=3)
    w, bias = cache[key]
    return classify(d, w, bias)


def _plan_time(spark, name, fn, sf_dir, out):
    """Time DataFrame construction + physical-plan materialization
    WITHOUT execution — the driver-side Catalyst cost a bench
    iteration pays before any task runs (guide §7.3)."""
    ts = []
    for _ in range(3):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df._jdf.queryExecution().executedPlan()
        ts.append(round(time.time() - t0, 3))
    out[f"plan:{name}"] = {"iters": ts, "min": min(ts)}
    print(f"  plan:{name:35s} min {min(ts):6.3f}", flush=True)


PROBES = {
    "ts_agg": _ev_agg,
    "ts_dense_nofill": _ev_dense_nofill,
    "ts_dense": _ev_dense,
    "ts_roll": _ev_roll,
    "ts_roll_ewma": _ev_roll_ewma,
    "ts_ewma_only": _ev_ewma_only,
    "pr_prep": _pr_prep,
    "pr_1": _pr_1,
    "pr_5": _pr_5,
    "gklk_build": _gklk_build,
    "gklk_full": _gklk_full,
    "sem_nofit": _sem_nofit,
    "sem_full": _sem_full,
    "clf_score_only": _clf_score_only,
    "clf_full": _clf_full,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(PROBES)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="opt_probe_r15",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = Engine.for_dir(spark, sf_dir)
    for t in warm.tables.values():
        t.limit(1).count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {}
    row_qs = None
    for n in names:
        if n.startswith("row:"):
            # time any bench row by name: `row:ngram_ppl` — same
            # warm/iter/noop methodology as the named probes
            if row_qs is None:
                import bench

                row_qs = bench.headline_queries()
            _time(spark, n, row_qs[n[4:]], sf_dir, out)
        else:
            _time(spark, n, PROBES[n], sf_dir, out)
    # driver-side plan cost for the heavy-plan rows (no execution)
    import bench

    qs = bench.headline_queries()
    for n in (
        "ts_rolling", "gk_local_by_key", "gk_quantile", "gk_by_key",
        "dedup_minhash", "corpus_profile", "gk_local_quantile",
        "mg_local_hh", "semantic_dedup", "ngram_ppl", "substr_dedup",
    ):
        if n in qs and (not sys.argv[2:] or n in names):
            try:
                _plan_time(spark, n, qs[n], sf_dir, out)
            except Exception as e:  # noqa: BLE001
                print(f"  plan:{n} failed: {e}")
    print(json.dumps(out))
    # merge under an optional label so A/B passes accumulate in one
    # artifact instead of overwriting each other
    path = "artifacts/opt_probe_r15.json"
    label = os.environ.get("SPARK_GRAFT_PROBE_LABEL")
    merged: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    if label:
        merged.setdefault(label, {}).update(out)
    else:
        merged.update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)


if __name__ == "__main__":
    main()
