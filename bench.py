"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>,
   "queries_min": {name: sec, ...}, "noisy": [name, ...],
   "warmup": {name: sec, ...}, "iterations": {name: [sec, ...]},
   "members": {"ann_topk": {...}, "dedup_minhash": {...}}}

Methodology (round-5 forensics — the r3/r4 drift was measurement, not
plans: solo warm runs of the "regressed" rows reproduce their r2 costs,
and per-query GC time during a full suite pass totals <1s with 0ms on
the spiking rows, so the 2-5x single-iteration spikes are external box
contention plus the first iteration's one-time codegen compile):

- one UNTIMED warm-up pass runs every query first, so whole-stage
  codegen compilation and parquet footer reads are paid outside the
  timed window; the warm-up pass's own times are reported in `warmup`
  so the cold cost stays visible in the artifact,
- every query then runs N_ITER (default 5) timed passes, ROUND-ROBIN
  (all queries once, then again) so a transient box stall lands on one
  iteration of one query instead of silently inflating a single shot;
  `queries` reports the MEDIAN, `queries_min` the MIN (the
  contention-free floor), and `noisy` lists rows where median > 1.5x
  min — on those rows, round-over-round median deltas are noise, and
  min is the comparable number,
- merged gate rows get separately-timed `members` (ann_topk: brute +
  IVF; dedup_minhash: signature agg -> +band join -> full verify as
  cumulative stages) so the merged row's cost is attributable to a
  stage, not just a total.

Each query executes fully via the `noop` sink (no driver collect, no
result materialization skew).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from knovexlite_spark.session import get_spark  # noqa: E402

N_ITER = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "5"))


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
    qs = {n: all_q[n] for n in names if n in all_q}
    # the dedup_minhash GATE row is a tagged union of two fixtures
    # (round 6); the bench times them as separate first-class rows so
    # the headline stays attributable and round-comparable:
    #   dedup_minhash          = the r1-r5 row (100%-density self-union,
    #                            restriction off — the adversarial fixture)
    #   dedup_minhash_default  = the SHIPPED default path
    #                            (restrict_verify=True) at ~10% baseline
    #                            duplicate density — the number a user gets
    from knovexlite_spark.queries import pipeline

    qs["dedup_minhash"] = pipeline._minhash_selfu
    qs["dedup_minhash_default"] = pipeline._minhash_base_default
    # same split for the text row: the gate's text_quality gained the
    # PII tier in round 6 — bench keeps the r1-r5-comparable quality
    # row and times the PII tier as its own first-class row
    qs["text_quality"] = pipeline._text_quality_base
    qs["pii_scrub"] = pipeline._pii_scrub
    return qs


def member_queries():
    """Separately-timed members/stages of merged or multi-stage gate
    rows (diagnostic only — not part of the headline total, which times
    the merged rows as the gate runs them).  dedup_minhash's members are
    CUMULATIVE prefixes of its pipeline: `sigs` = shingle explode +
    signature agg, `cand` = sigs + banded candidate join, `full` = the
    whole gate query incl. exact Jaccard verify — so stage costs are
    the deltas between consecutive members."""
    from knovexlite_spark.queries import pipeline

    return {
        "ann_topk": {
            "brute": pipeline._ann_brute,
            "ivf_full": pipeline._ann_ivf_full,
        },
        "dedup_minhash": {
            "sigs": pipeline._minhash_sigs,
            "cand": pipeline._minhash_cand,
            "full": pipeline._minhash_selfu,
        },
        "dedup_minhash_default": {
            "md5": pipeline._minhash_base_default,
            "xxhash64": pipeline._minhash_base_default_xx,
        },
    }


def _run_once(fn, spark, sf_dir) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # -Xms=-Xmx + AlwaysPreTouch: fault the whole heap in at JVM start
    # (untimed) instead of mid-run.  Measured round 5: without it, the
    # heap grows to its high-water mark during the first heavy queries
    # and the kernel page-faulting shows up as 10-18s of SYSTEM time
    # inside individual iterations (wall 2s -> 8s spikes, gc=0, steal=0);
    # with it, the same probe has zero spikes after the codegen warm-up.
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="knovexlite_bench",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM + parquet footers once so timings measure queries,
    # not session bring-up (the first query otherwise pays ~5s).
    from knovexlite_spark.engine import Engine

    warm = Engine.for_dir(spark, sf_dir)
    for t in warm.tables.values():
        t.limit(1).count()
    # also spin the Python/Arrow worker pool once: kernel-bearing
    # queries (minhash, ann) otherwise pay the pool startup inside
    # their first timed iteration, inflating that iteration ~2x
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    qs = headline_queries()

    # untimed warm-up pass: pays per-plan one-time costs (whole-stage
    # codegen compile, broadcast warm, shuffle-file page cache) outside
    # the timed window; recorded so the cold cost stays in the artifact
    warmup = {name: _run_once(fn, spark, sf_dir) for name, fn in qs.items()}

    iters: dict[str, list[float]] = {n: [] for n in qs}
    for _ in range(max(1, N_ITER)):
        for name, fn in qs.items():
            iters[name].append(_run_once(fn, spark, sf_dir))

    timings = {n: round(statistics.median(v), 3) for n, v in iters.items()}
    mins = {n: round(min(v), 3) for n, v in iters.items()}
    noisy = sorted(n for n in timings if timings[n] > 1.5 * mins[n])

    members: dict[str, dict[str, float]] = {}
    for row, mems in member_queries().items():
        if row in qs:
            members[row] = {
                m: round(
                    statistics.median(
                        [_run_once(fn, spark, sf_dir) for _ in range(max(1, N_ITER))]
                    ),
                    3,
                )
                for m, fn in mems.items()
            }

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "queries_min": mins,
                "noisy": noisy,
                "warmup": warmup,
                "iterations": iters,
                "members": members,
            }
        )
    )


if __name__ == "__main__":
    main()
