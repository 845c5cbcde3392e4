"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line (the driver contract — kept under the
driver's 2000-char stdout tail window, which the full round-7 payload
outgrew):
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "noisy": [...],
   "min_iter_spread": {"iter0": n, ...},
   "warmup_cycle_totals": {"core": [...], "extra": [...]},
   "core_median_sum": s, "core_min_sum": s,
   "sf6x": {"queries": {...}, "v2_queries": {...}},
   "telemetry": "BENCH_FULL.json"}
and writes the FULL telemetry (queries_min, warmup, per-row
iterations, min_iter_index, cycles, members, full sf6x) to
BENCH_FULL.json at the repo root; scripts/render_bench_docs.py
renders the SCALE.md / COVERAGE.md bench-protocol sections from that
sidecar so every doc number is generated from a named artifact.

Methodology (round-6 forensics: in BENCH_r06 all 16 rows hit their
minimum on the FINAL iteration — one untimed warm-up pass did not
absorb the warming trend once the cycle grew to 16 rows, so medians
carried a monotone drift and were not round-comparable; r5 forensics
already showed the earlier drifts were measurement too):

- PLATEAU WARM-UP: untimed warm-up CYCLES over the whole set repeat
  until the cycle total stabilizes (core: within 5% of the previous
  cycle, max 6 cycles; EXTRA: within 2%, max 10 — round-8 forensics
  showed the heavy extra rows still falling through a 5% gate), so
  codegen compilation, broadcast warm-up, shuffle page-cache, and
  cross-query cache pressure are all paid before the timed window
  opens.  The first cycle's per-query times are reported in `warmup`
  (the cold cost stays visible) and every cycle total in
  `warmup_cycle_totals`.
- FROZEN CYCLE COMPOSITION: the timed round-robin runs over the FIXED
  14-row `core` set (the r1–r5 composition — never append to it), so
  round-over-round medians compare like with like.  Rows added after
  r5 bench in a SEPARATE `extra` cycle with its own plateau warm-up;
  `cycles` records the split.  `queries`/`queries_min` still cover
  both sets (keyed by name) for the driver's single-table view.
- every query runs N_ITER (core default 5; extra default 7 — the
  heavy rows need the longer window) timed passes ROUND-ROBIN within
  its cycle (all queries once, then again) so a transient box stall
  lands on one iteration of one query; `queries` reports the MEDIAN,
  `queries_min` the MIN (the contention-free floor), `noisy` rows
  where median > 1.5x min, and `min_iter_index` each row's argmin —
  a healthy steady-state run has these spread across iterations, not
  piled on the last one.
- merged gate rows get separately-timed `members` (ann_topk: brute +
  IVF; dedup_minhash: cumulative signature -> +band -> full stages).
- SF6X TIER: a fixed 5-row subset (the most expensive rows) re-runs
  against a 6x id-shifted blow-up of the sf0.1 corpus (built via
  scripts/scale_rehearsal.build_blowup with salted documents so
  near-dup output density stays at baseline; cached in /tmp across
  invocations) with its own plateau warm-up + 3 iterations — catching
  scale regressions the sf0.1 bench hides.  Disable with
  SPARK_GRAFT_BENCH_6X=0.

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
# the EXTRA cycle is dominated by heavy iterative rows (pagerank,
# clf_score, semantic_dedup) that keep warming long after the core
# plateaus — round-8 forensics: extra warm-up totals [31.5, 25.6,
# 22.5, 21.9] passed the 5% gate while still falling, and 11/24 rows
# bottomed on their FINAL timed iteration, so extra-row medians
# overstated steady state.  The extra cycle therefore warms to a
# TIGHTER 2% plateau with more cycles allowed, and times 7 iterations
# so a still-settling first pass can't drag the median.
N_ITER_EXTRA = int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA_ITERS", "7"))
N_ITER_6X = int(os.environ.get("SPARK_GRAFT_BENCH_6X_ITERS", "3"))
PLATEAU_TOL = 0.05
PLATEAU_TOL_EXTRA = 0.02
MAX_WARM_CYCLES = 6
MAX_WARM_CYCLES_EXTRA = 10
# per-row adaptive cap (round 11): a row keeps timing while its
# running min improved within the last 2 iterations, up to this many
MAX_ROW_ITERS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_ITERS", "12"))

# FROZEN r1–r5 composition — the round-comparable core. Never append;
# new rows go to EXTRA (their own cycle) so this table's medians stay
# comparable across rounds.
CORE = [
    "q1_filter_project",
    "q3_multiway_join",
    "q7_grouped_agg",
    "q11_topk_window",
    "q23_local_supplier_revenue",
    "q12_window_frame",
    "q18_tumbling_window",
    "cq_paths",
    "cq9_samenation",
    "dedup_exact",
    "dedup_minhash",
    "text_quality",
    "ann_topk",
    "lang_id",
]

# Rows added after round 5 — benched in a separate cycle.
EXTRA = [
    "dedup_minhash_default",
    "pii_scrub",
    "substr_dedup",
    "domain_cap",
    "ngram_ppl",
    "semantic_dedup",
    "bm25_topk",
    "clf_score",
    "rrf_fuse",
    "pagerank",
    "gk_quantile",
    "gk_local_quantile",
    "gk_by_key",
    "gk_local_by_key",
    "mg_heavy_hitters",
    "mg_local_hh",
    "mg_keyed_hh",
    "mg_local_keyed",
    "ts_resample",
    "ts_rolling",
    "corpus_profile",
    "gk_local_noex",
    "bpe_encode",
    "bpe_encode_real",
]

# Fixed 6x subset: the most expensive rows (round-6 medians), frozen
# for round-comparability of the sf6x section.
SF6X_ROWS = [
    "dedup_minhash",
    "dedup_minhash_default",
    "ann_topk",
    "q23_local_supplier_revenue",
    "q18_tumbling_window",
]

# Second frozen 6x subset (round 8): the round-7 heavy tier — the
# rows whose 100-TB claims previously rested on design argument alone.
# Benched as its own cycle so SF6X_ROWS stays round-comparable.
SF6X_ROWS_V2 = [
    "semantic_dedup",
    "bm25_topk",
    "ngram_ppl",
    "substr_dedup",
    "clf_score",
]

# Third frozen 6x subset (round 11): the sketch/rollup analytics tier
# — per-key quantiles, heavy hitters over the real token stream, and
# the hypertable resample (6x users AND 6x events, so the dense
# output grows ~6x too).  Own cycle, same reasoning.
SF6X_ROWS_V3 = [
    "gk_quantile",
    "gk_by_key",
    "mg_heavy_hitters",
    "ts_resample",
]

# Fourth frozen 6x subset (round 12): the bounded-memory MG build
# (A/B twin of mg_heavy_hitters — no token-sized shuffle) and the
# rolling tier over the dense series (A/B against ts_resample — the
# delta is pure window evaluation).  Own cycle, same reasoning.
SF6X_ROWS_V4 = [
    "mg_local_hh",
    "ts_rolling",
]

# Fifth frozen 6x subset (round 13): the bounded-memory GK quantile
# build (A/B twin of gk_quantile — no per-group sort-window pass; the
# exact sibling of the mg_local_hh/mg_heavy_hitters pair) and the
# per-language heavy-hitters A/B (exact-count per-key build vs the
# open-vocabulary per-partition local build).  Own cycle, same
# reasoning.
SF6X_ROWS_V5 = [
    "gk_local_quantile",
    "gk_local_by_key",
    "mg_keyed_hh",
    "mg_local_keyed",
]


def headline_queries():
    """name -> callable(spark, sf_dir) -> DataFrame. Chosen to cover the
    engine's surfaces: scan/filter, multiway join, grouped agg, window
    top-k, event windows, EFO chain/cyclic joins, pipeline ops."""
    from knovexlite_spark.queries import registry

    all_q = registry.queries()
    qs = {n: all_q[n] for n in CORE + EXTRA if n in all_q}
    # the dedup_minhash GATE row is a tagged union of fixtures; the
    # bench times them as separate first-class rows so the headline
    # stays attributable and round-comparable:
    #   dedup_minhash          = the r1-r5 row (100%-density self-union,
    #                            restriction off — the adversarial fixture)
    #   dedup_minhash_default  = the SHIPPED default path
    #                            (restrict_verify=True) at ~10% baseline
    #                            duplicate density — the number a user gets
    from knovexlite_spark.queries import pipeline

    qs["dedup_minhash"] = pipeline._minhash_selfu
    qs["dedup_minhash_default"] = pipeline._minhash_base_default
    # same split for the text row: bench keeps the r1-r5-comparable
    # quality row; the PII tier is its own first-class row
    qs["text_quality"] = pipeline._text_quality_base
    qs["pii_scrub"] = pipeline._pii_scrub
    # dedup_exact gate row became a tagged union in round 7 (doc +
    # substr members); the frozen core row keeps the r1-r6 doc-level
    # shape, the substr member times as its own EXTRA row below
    from knovexlite_spark.ops import dedup as D

    qs["dedup_exact"] = lambda spark, sf_dir: D.exact_duplicates(
        pipeline._docs_selfunion(spark, sf_dir)
    )
    # lang_id gate row became a tagged union in round 10 (marker +
    # lidm trained-model member on the fixture split); the frozen core
    # row keeps the r1-r9 marker-only shape over the documents table
    qs["lang_id"] = pipeline._lang_id_marker
    # ann_topk gate row gained 'rrf'/'rrfs' members in round 8; the
    # frozen core row keeps the r1-r7 brute+ivf_full shape (fusion is
    # already timed first-class as the rrf_fuse EXTRA row)
    from pyspark.sql import functions as _F

    qs["ann_topk"] = lambda spark, sf_dir: pipeline._ann_brute(
        spark, sf_dir
    ).select(_F.lit("brute").alias("kind"), "query_id", "neighbor_id", "rn").unionAll(
        pipeline._ann_ivf_full(spark, sf_dir).select(
            _F.lit("ivf_full").alias("kind"), "query_id", "neighbor_id", "rn"
        )
    )
    # round-7 rows (EXTRA cycle): substring-level span dedup and the
    # per-domain cap, timed standalone (their gate coverage rides as
    # members of dedup_exact / text_quality-adjacent rows)
    for name, attr in (
        ("substr_dedup", "_substr_dedup_bench"),
        ("domain_cap", "_domain_cap_bench"),
        ("ngram_ppl", "_ngram_ppl_bench"),
        ("semantic_dedup", "_semantic_dedup_bench"),
        ("bm25_topk", "_bm25_bench"),
        ("clf_score", "_clf_score_bench"),
        ("rrf_fuse", "_rrf_fuse_bench"),
        ("pagerank", "_pagerank_bench"),
    ):
        if hasattr(pipeline, attr):
            qs[name] = getattr(pipeline, attr)
    # round-10 row: the from-scratch quantile summary in its scale form
    # (32 hash groups, hierarchical merge at fan_in=8)
    from knovexlite_spark.queries import extras

    qs["gk_quantile"] = extras._gk_bench
    # round-13 row: its A/B twin with the bounded-memory mapInPandas
    # build (no per-group sort-window pass anywhere in the plan)
    qs["gk_local_quantile"] = extras._gk_local_bench
    qs["gk_local_by_key"] = extras._gk_local_by_key_bench
    # round-11 rows: the per-key variant (p50/p95/p99 per 1024-key
    # residue class in one pass — the analytics form) and the
    # heavy-hitters sketch over the real token stream
    qs["gk_by_key"] = extras._gk_by_key_bench
    qs["mg_heavy_hitters"] = extras._mg_bench
    # q18 gate row became a tagged union in round 11 (win + tsr
    # hypertable-resample members); the frozen core row keeps the
    # r1-r10 tumbling-window shape, the resample times as its own
    # EXTRA row (15 min stride per user — ~4.3M dense rows at sf0.1)
    from knovexlite_spark.queries import relational

    qs["q18_tumbling_window"] = relational._q18_frozen
    qs["ts_resample"] = extras._ts_resample_bench
    # round-12 rows: the bounded-memory heavy-hitters build (A/B twin
    # of mg_heavy_hitters — no token-sized shuffle anywhere) and the
    # per-key moving aggregates over the gap-filled series
    # registered UNCONDITIONALLY (round-12 ADVICE): a missing bench
    # function must fail the run loudly, not silently thin the frozen
    # sf6x subset (sub4 filters rows by presence)
    qs["mg_local_hh"] = extras._mg_local_bench
    qs["ts_rolling"] = extras._ts_rolling_bench
    # round-13 rows: per-language heavy hitters A/B — the exact-count
    # per-key build vs the open-vocabulary per-partition local build
    qs["mg_keyed_hh"] = extras._mg_keyed_bench
    qs["mg_local_keyed"] = extras._mg_local_keyed_bench
    # round-14 row: the one-pass multi-sketch profiler (GK + MG + HLL
    # + stats from a single lineitem scan); its 'three_pass' member
    # times the same summaries as four standalone scans
    qs["corpus_profile"] = extras._corpus_profile_bench
    # round-14 row: gk_summary_local in its DESIGNED no-exchange shape
    # (the r13 gk_local_quantile row kept its repartition(32), which
    # round-14 measurement showed costs more than it buys at every
    # scale; the frozen row stays for comparability)
    qs["gk_local_noex"] = extras._gk_local_noex_bench
    # round-14 row: BPE encode throughput (Arrow-batched kernel,
    # broadcast ranks, per-task word cache) — merges learned once per
    # sf_dir, cached module-level, so the row times the encode
    qs["bpe_encode"] = extras._bpe_encode_bench
    # round-15 row: the TRANSFERABLE BPE number — realistic 30k-word
    # zipf vocabulary, 8,192 merges (incremental trainer), word cache
    # smaller than the vocabulary so the per-new-word merge loop stays
    # on the measured path (the r14 row's 31-word template vocabulary
    # made it a cache-hit-path number; that row stays for
    # comparability).  Corpus + merges cached per sf_dir; the row
    # times the encode.
    qs["bpe_encode_real"] = extras._bpe_encode_real_bench
    return qs


def member_queries():
    """Separately-timed members/stages of merged or multi-stage gate
    rows (diagnostic only — not part of the headline total, which times
    the merged rows as the gate runs them).  dedup_minhash's members are
    CUMULATIVE prefixes of its pipeline: `sigs` = shingle explode +
    signature agg, `cand` = sigs + banded candidate join, `full` = the
    whole gate query incl. exact Jaccard verify — so stage costs are
    the deltas between consecutive members."""
    from knovexlite_spark.queries import extras, pipeline

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
        # round-14 A/B: one scan for all sketch families vs one scan
        # per family — the delta is the amortized scan cost
        "corpus_profile": {
            "one_pass": extras._corpus_profile_bench,
            "three_pass": extras._profile_three_pass_bench,
        },
        # round-15 A/B: same realistic-vocabulary encode with the
        # 4,096-entry bounded cache vs a cache holding the whole 30k
        # vocabulary — the delta is the sustained miss-path
        # (per-new-word merge loop) cost
        "bpe_encode_real": {
            "cache4k": extras._bpe_encode_real_bench,
            "cachefull": extras._bpe_encode_real_fullcache,
        },
    }


# Cross-round calibration control (round-13 verdict #3: r12's core
# medians drifted +17..+33% on UNTOUCHED code with min-sum +3% — reads
# as machine/session variance, but nothing A/B'd it).  A fixed,
# DATA-FREE pure-Spark pipeline (range -> keyed window -> agg: touches
# shuffle, sort, window eval, and codegen, none of the repo's code)
# runs after the timed cycles each artifact-grade run; its cross-round
# ratio normalizes the environment, and the round table reports both
# raw and calibrated medians (scripts/render_bench_docs.py).
CALIB_ROWS = 10_000_000
CALIB_ITERS = 5


def _calib_once(spark) -> float:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = time.time()
    df = spark.range(0, CALIB_ROWS, 1, 32).selectExpr(
        "id % 9973 AS k", "id AS v"
    )
    w = Window.partitionBy("k").orderBy("v")
    (
        df.withColumn("rn", F.row_number().over(w))
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.max("rn").alias("m"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.time() - t0, 3)


def _calibration(spark, iters: int | None = None, warm: int = 2) -> dict:
    """``warm`` untimed passes + ``iters`` timed; median and min.
    The post-sf6x bracket pass uses a shorter budget (the control is
    warm by then — it measures session state, not cold-start)."""
    for _ in range(warm):
        _calib_once(spark)
    iters = [_calib_once(spark) for _ in range(iters or CALIB_ITERS)]
    return {
        "rows": CALIB_ROWS,
        "iterations": iters,
        "median": round(statistics.median(iters), 3),
        "min": round(min(iters), 3),
    }


def _run_once(fn, spark, sf_dir) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 3)


def _bench_cycle(
    spark, sf_dir, qs, n_iter,
    plateau_tol=PLATEAU_TOL, max_cycles=MAX_WARM_CYCLES,
    max_iter=MAX_ROW_ITERS,
):
    """Plateau warm-up + n_iter round-robin timed passes over qs, then
    a PER-ROW ADAPTIVE TAIL (round 11 — the r10b artifact showed 13/25
    rows bottoming on their FINAL timed iteration: the plateau check
    gates the cycle total, but individual rows can still be descending
    when the fixed iteration budget runs out).  A row whose running
    min improved within its last 2 iterations keeps timing — extra
    passes run round-robin across all still-descending rows so the
    interleaving stays honest — capped at max_iter.
    Returns (first_warmup_cycle, warmup_cycle_totals, iterations)."""
    warmup_first: dict[str, float] = {}
    cycle_totals: list[float] = []
    prev = None
    for i in range(max_cycles):
        cyc = {name: _run_once(fn, spark, sf_dir) for name, fn in qs.items()}
        if i == 0:
            warmup_first = cyc
        tot = sum(cyc.values())
        cycle_totals.append(round(tot, 3))
        if prev is not None and abs(tot - prev) <= plateau_tol * prev:
            break
        prev = tot
    iters: dict[str, list[float]] = {n: [] for n in qs}
    for _ in range(max(1, n_iter)):
        for name, fn in qs.items():
            iters[name].append(_run_once(fn, spark, sf_dir))
    while True:
        live = [
            n
            for n, v in iters.items()
            if len(v) < max_iter and v.index(min(v)) >= len(v) - 2
        ]
        if not live:
            break
        for name in live:
            iters[name].append(_run_once(qs[name], spark, sf_dir))
    return warmup_first, cycle_totals, iters


def _sf6x_section(spark, qs):
    """Build/reuse the salted 6x blow-up and bench the fixed subset."""
    dst = "/tmp/sf_blowup_bench6x_salted"
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from scale_rehearsal import build_blowup

    t0 = time.time()
    if not os.path.exists(os.path.join(dst, "region.parquet")):
        os.environ["REHEARSAL_SALT_DOCS"] = "1"
        try:
            build_blowup(spark, 6, dst)
        finally:
            os.environ.pop("REHEARSAL_SALT_DOCS", None)
    build_sec = round(time.time() - t0, 3)

    sub = {n: qs[n] for n in SF6X_ROWS if n in qs}
    from knovexlite_spark.engine import Engine

    warm = Engine.for_dir(spark, dst)
    for t in warm.tables.values():
        t.limit(1).count()
    # heavy rows: cap the adaptive tail tighter so the 6x tier's wall
    # clock stays bounded
    _, cycle_totals, iters = _bench_cycle(spark, dst, sub, N_ITER_6X, max_iter=6)
    timings = {n: round(statistics.median(v), 3) for n, v in iters.items()}
    mins = {n: round(min(v), 3) for n, v in iters.items()}
    out = {
        "blowup": 6,
        "base_sf": 0.1,
        "salted_docs": True,
        "build_sec": build_sec,
        "queries": timings,
        "queries_min": mins,
        "iterations": iters,
        "warmup_cycle_totals": cycle_totals,
        "value": round(sum(timings.values()), 3),
    }
    # second frozen subset (round 8): the heavy pipeline tier, its own
    # cycle so the original subset's totals stay round-comparable
    sub2 = {n: qs[n] for n in SF6X_ROWS_V2 if n in qs}
    if sub2:
        _, cyc2, it2 = _bench_cycle(spark, dst, sub2, N_ITER_6X, max_iter=6)
        out["v2"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it2.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it2.items()},
            "iterations": it2,
            "warmup_cycle_totals": cyc2,
        }
    # third frozen subset (round 11): the sketch/rollup analytics tier
    sub3 = {n: qs[n] for n in SF6X_ROWS_V3 if n in qs}
    if sub3:
        _, cyc3, it3 = _bench_cycle(spark, dst, sub3, N_ITER_6X, max_iter=6)
        out["v3"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it3.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it3.items()},
            "iterations": it3,
            "warmup_cycle_totals": cyc3,
        }
    # fourth frozen subset (round 12): bounded-memory MG + rolling tier
    sub4 = {n: qs[n] for n in SF6X_ROWS_V4 if n in qs}
    if sub4:
        _, cyc4, it4 = _bench_cycle(spark, dst, sub4, N_ITER_6X, max_iter=6)
        out["v4"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it4.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it4.items()},
            "iterations": it4,
            "warmup_cycle_totals": cyc4,
        }
    # fifth frozen subset (round 13): bounded-memory GK quantile build
    sub5 = {n: qs[n] for n in SF6X_ROWS_V5 if n in qs}
    if sub5:
        _, cyc5, it5 = _bench_cycle(spark, dst, sub5, N_ITER_6X, max_iter=6)
        out["v5"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it5.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it5.items()},
            "iterations": it5,
            "warmup_cycle_totals": cyc5,
        }
    # sixth frozen subset (round 14): the one-pass profiler A/B at 6x
    # — one scan for all sketch families vs one scan per family, at a
    # data size where the scan actually costs something
    from knovexlite_spark.queries import extras as _extras

    sub6 = {
        "corpus_profile": qs.get("corpus_profile"),
        "corpus_profile_3pass": _extras._profile_three_pass_bench,
        "gk_local_noex": qs.get("gk_local_noex"),
        "bpe_encode": qs.get("bpe_encode"),
    }
    sub6 = {n: f for n, f in sub6.items() if f is not None}
    if sub6:
        _, cyc6, it6 = _bench_cycle(spark, dst, sub6, N_ITER_6X, max_iter=6)
        out["v6"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it6.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it6.items()},
            "iterations": it6,
            "warmup_cycle_totals": cyc6,
        }
    # seventh frozen subset (round 15): the transferable BPE row at 6x
    # — the synthetic realistic-vocabulary corpus scales with the 6x
    # documents count (30k docs -> 12M words), bounded 4,096-entry
    # cache, so the miss path is measured at a size where the Arrow
    # scan also costs something.  (Registered r15; first artifacts
    # carrying it are r16's — the r15 number lives in the
    # bpe_real_6x_probe_r15 artifact, same machinery.)
    sub7 = {"bpe_encode_real": qs.get("bpe_encode_real")}
    sub7 = {n: f for n, f in sub7.items() if f is not None}
    if sub7:
        _, cyc7, it7 = _bench_cycle(spark, dst, sub7, N_ITER_6X, max_iter=6)
        out["v7"] = {
            "queries": {n: round(statistics.median(v), 3) for n, v in it7.items()},
            "queries_min": {n: round(min(v), 3) for n, v in it7.items()},
            "iterations": it7,
            "warmup_cycle_totals": cyc7,
        }
    # 24x quantile-pair tier (round 14, verdict #1): the r13 6x
    # exact-vs-local ordering sat inside the ±13% session envelope by
    # mins; at 24x (4x-exploded 6x stream, identical generation plan
    # on both sides) the exact build's sort-window growth should
    # separate the pair unambiguously.  Tighter budget (2 warm cycles,
    # 2+tail iters) — two heavy rows, crossing-evidence only.
    subq = {
        "gk_quantile_24x": _extras._gk_bench_24x,
        "gk_local_quantile_24x": _extras._gk_local_bench_24x,
        "gk_local_noex_24x": _extras._gk_local_noex_bench_24x,
    }
    _, cycq, itq = _bench_cycle(
        spark, dst, subq, 2, max_cycles=2, max_iter=4
    )
    out["q24x"] = {
        "blowup": 24,
        "queries": {n: round(statistics.median(v), 3) for n, v in itq.items()},
        "queries_min": {n: round(min(v), 3) for n, v in itq.items()},
        "iterations": itq,
        "warmup_cycle_totals": cycq,
    }
    return out


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
    core_qs = {n: qs[n] for n in CORE if n in qs}
    extra_qs = {n: qs[n] for n in EXTRA if n in qs}

    # 3-POINT calibration (round-14 verdict #5: the r14 a/b artifacts'
    # calib_post spread 47% — one pre-6x point couldn't say which tier
    # the slow session actually degraded).  PRE runs before the core
    # cycle, MID (the r13 'calib') between the EXTRA cycle + members
    # and the 6x tier, POST after the 6x tier — so every timed tier is
    # bracketed by controls on both sides and tier medians can be
    # normalized within-run.
    calib_pre = _calibration(spark, iters=3, warm=2)

    warmup, warm_core_totals, iters = _bench_cycle(spark, sf_dir, core_qs, N_ITER)
    warm_extra_totals: list[float] = []
    if extra_qs:
        warmup_e, warm_extra_totals, iters_e = _bench_cycle(
            spark, sf_dir, extra_qs, N_ITER_EXTRA,
            plateau_tol=PLATEAU_TOL_EXTRA, max_cycles=MAX_WARM_CYCLES_EXTRA,
        )
        warmup.update(warmup_e)
        iters.update(iters_e)

    timings = {n: round(statistics.median(v), 3) for n, v in iters.items()}
    mins = {n: round(min(v), 3) for n, v in iters.items()}
    noisy = sorted(n for n in timings if timings[n] > 1.5 * mins[n])
    min_idx = {n: v.index(min(v)) for n, v in iters.items()}

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

    # The calibration control BRACKETS the sf6x tier (round-13 advice:
    # a single pre-tier control doesn't reflect the session state the
    # 6x timings actually run in): full pass before, short pass after.
    # With calib_pre above, this is the MID point of the r15 3-point
    # bracket.
    calib = _calibration(spark)

    sf6x = None
    calib_post = None
    if os.environ.get("SPARK_GRAFT_BENCH_6X", "1") != "0":
        try:
            sf6x = _sf6x_section(spark, qs)
        except Exception as e:  # the 6x tier must never sink the headline
            sf6x = {"error": f"{type(e).__name__}: {e}"}
        calib_post = _calibration(spark, iters=3, warm=1)

    total = round(sum(timings.values()), 3)
    full = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "queries_min": mins,
        "noisy": noisy,
        "warmup": warmup,
        "iterations": iters,
        "warmup_cycle_totals": {
            "core": warm_core_totals,
            "extra": warm_extra_totals,
        },
        "min_iter_index": min_idx,
        # adaptive-tail stop points (round 11): how many iterations
        # each row actually ran before its min stopped improving (or
        # the cap hit) — the per-row warm-up health signal
        "n_iters": {n: len(v) for n, v in iters.items()},
        "cycles": {
            "core": sorted(core_qs),
            "extra": sorted(extra_qs),
        },
        "members": members,
        "calib_pre": calib_pre,
        "calib": calib,
        "calib_post": calib_post,
        "sf6x": sf6x,
    }
    # Full telemetry goes to a sidecar file (BENCH_FULL.json at the
    # repo root — scripts/render_bench_docs.py renders the SCALE.md /
    # COVERAGE.md protocol sections from it, so doc numbers are
    # generated, never hand-copied).  Stdout stays ONE compact line:
    # the round driver keeps only the tail of stdout, and the round-7
    # artifact shows the full payload outgrew that window (parsed:
    # null, headline truncated away) — the compact line carries the
    # driver-contract fields plus summary telemetry and always fits.
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(sidecar, "w") as f:
        json.dump(full, f, indent=1)
    spread: dict[str, int] = {}
    for i in min_idx.values():
        spread[f"iter{i}"] = spread.get(f"iter{i}", 0) + 1
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": full["sf"],
        "noisy": noisy,
        "min_iter_spread": dict(sorted(spread.items())),
        "warmup_cycle_totals": full["warmup_cycle_totals"],
        "core_median_sum": round(sum(timings[n] for n in core_qs), 3),
        "core_min_sum": round(sum(mins[n] for n in core_qs), 3),
        "calib_pre": calib_pre["median"],
        "calib": calib["median"],
        "calib_post": calib_post["median"] if calib_post else None,
        "telemetry": "BENCH_FULL.json",
    }
    if isinstance(sf6x, dict) and "queries" in sf6x:
        compact["sf6x"] = {
            "queries": sf6x["queries"],
            "v2_queries": sf6x.get("v2", {}).get("queries", {}),
        }
    elif sf6x is not None:
        compact["sf6x"] = sf6x
    payload = json.dumps(compact)
    if len(payload) > 1900:
        # the driver keeps only a ~2000-char stdout tail (round-7
        # forensics); as the row set grows, shed the duplicated sf6x
        # detail (it lives in full in the sidecar) before the
        # headline fields risk truncating away
        compact["sf6x"] = "see BENCH_FULL.json"
        payload = json.dumps(compact)
    print(payload)


if __name__ == "__main__":
    main()
