"""Custom stateful streaming operators via ``applyInPandasWithState``
(the brief's escape hatch for operators the built-in windows can't
express).

``running_user_stats`` keeps per-user running (count, sum, max) state
across micro-batches and emits the updated row each time the user
appears — the canonical keyed-state shape: state is per group key,
lives in the state store, and survives across triggers.  Batch parity:
after the source drains, the latest row per user equals the batch
aggregation (pinned by tests).

Scale notes: state is partitioned by the group key like any keyed
stream; a timeout (``GroupStateTimeout``) bounds state growth for
keys that go quiet — demonstrated here with NoTimeout because the test
source is finite.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double, max_value double"
STATE_SCHEMA = "n long, s double, m double"


def _update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s, m = state.get
    else:
        n, s, m = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            m = max(m, float(pdf["value"].max()))
    state.update((n, s, m))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [s],
            "max_value": [m],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running stats with keyed state (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming quantiles: the mergeable GK summary (ops/quantile.py) as
# keyed state — merge-legality is exactly what makes a quantile sketch
# streamable: each micro-batch SUMMARIZES in-memory (exact order
# statistics of the batch slice) and MERGES into the state summary,
# so state stays ~k points per key forever while the answers keep the
# rank-error contract against the FULL history.  This completes the
# batch/stream symmetry the Bloom/MinHash/semantic ingest dedup
# already has: same algebra, py_gk_* kernels, both sides test-pinned
# against exact ranks.
# ---------------------------------------------------------------------------

QUANTILE_FRACS = (0.5, 0.9, 0.99)
Q_OUT_SCHEMA = (
    "user_id long, n_seen long, p50 long, p90 long, p99 long"
)
Q_STATE_SCHEMA = "vs array<long>, lo array<long>, hi array<long>"


def _quantile_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from knovexlite_spark.ops.quantile import (
        py_gk_build,
        py_gk_compress,
        py_gk_merge,
        py_gk_query,
    )

    if state.exists:
        vs, lo, hi = state.get
        summary = list(zip(vs, lo, hi))
    else:
        summary = []
    vals = []
    for pdf in pdfs:
        vals.extend(int(x) for x in pdf["__qv"].dropna())
    batch = py_gk_build(vals, k=32)
    merged = py_gk_merge([s for s in (summary, batch) if s])
    summary = py_gk_compress(merged, k=32)
    state.update((
        [p[0] for p in summary],
        [p[1] for p in summary],
        [p[2] for p in summary],
    ))
    n = max((p[2] for p in summary), default=0)
    qs = py_gk_query(summary, list(QUANTILE_FRACS)) if summary else [None] * 3
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_seen": [n],
            "p50": [qs[0]],
            "p90": [qs[1]],
            "p99": [qs[2]],
        }
    )


def running_quantiles(
    events: DataFrame, value_col: str = "value", scale: int = 100
) -> DataFrame:
    """Per-user running p50/p90/p99 over the full event history with
    ~k points of state per key: float values quantize to integers at
    ``scale`` (the gk integral contract — answers are exact integer
    rank brackets over the quantized domain), each trigger merges the
    micro-batch's exact summary into the state summary.  Update output
    mode; the latest row per key carries the current answers."""
    from pyspark.sql import functions as F

    src = events.select(
        "user_id",
        F.round(F.col(value_col) * scale).cast("long").alias("__qv"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _quantile_update,
        Q_OUT_SCHEMA,
        Q_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: the Misra-Gries summary (ops/sketch.py) as
# keyed state — merge-legality again: each micro-batch summarizes its
# slice exactly (py_mg_build) and merges into the state counter table
# (py_mg_merge), so state stays <= m counters per key forever while
# the bracket/coverage contract holds against the FULL history:
# cnt <= true <= cnt + err for kept items, true <= err for absent
# ones.  Batch twin: ops/sketch.mg_* (same algebra, tie order, and
# cnt-0 threshold-tie carriers — parity test-pinned).
# ---------------------------------------------------------------------------

HH_M = 3  # small vs the event_type vocabulary, so trims are load-bearing
HH_OUT_SCHEMA = "user_id long, n_seen long, item string, cnt long, err long"
HH_STATE_SCHEMA = "items array<string>, cnts array<long>, err long, n long"


def _hh_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from knovexlite_spark.ops.sketch import py_mg_build, py_mg_merge

    if state.exists:
        items, cnts, err, n = state.get
        table = (list(zip(items, cnts)), err)
    else:
        table, n = ([], 0), 0
    batch_items: list[str] = []
    for pdf in pdfs:
        batch_items.extend(str(x) for x in pdf["__item"].dropna())
    n += len(batch_items)
    rows, err = py_mg_merge(
        [table, py_mg_build(batch_items, HH_M)], HH_M
    )
    state.update((
        [it for it, _ in rows], [c for _, c in rows], err, n
    ))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(rows),
            "n_seen": [n] * len(rows),
            "item": [it for it, _ in rows],
            "cnt": [c for _, c in rows],
            "err": [err] * len(rows),
        }
    )


# ---------------------------------------------------------------------------
# Streaming rolling/EWMA: the moving-aggregate tier (ops/timeseries.py
# rolling/ewma) as keyed state — the streaming twin that completes
# batch<->stream parity for the analytics tier the way 'quant'/'hh'
# did for the sketches.  State per key is the RESAMPLE state: one
# (bucket, n, sv) partial aggregate per observed event-time bucket
# (counts and sums are mergeable, so micro-batches fold in exactly);
# each trigger re-emits the trailing-window answers for every bucket
# whose window was touched, so after the source drains the LATEST row
# per (key, bucket) equals the batch chain
#   resample -> rolling(frame='range') ++ gap_fill(None) -> ewma
# bucket-for-bucket, with the EWMA bit-exact (same IEEE fold: python
# floats ARE doubles, coefficients from the same _ewma_weights, terms
# summed in the same lag order — adding a 0.0 for an unobserved lag,
# as the batch expression does, is an IEEE no-op).
#
# Scale notes: state grows with a key's OBSERVED buckets (the
# continuous-aggregate shape, not the raw events) — a retention
# horizon / state timeout bounds it in production; values quantize to
# integers (the gk convention) so window sums are engine-exact.
# ---------------------------------------------------------------------------

ROLL_STRIDE_US = 900_000_000  # 15 min
ROLL_WINDOW = 4
ROLL_ALPHA = 0.25
ROLL_OUT_SCHEMA = (
    "user_id long, trig long, bucket_us long, n long, sv long, "
    "n_sum long, n_max long, n_count long, sv_sum long, sv_ewma double"
)
ROLL_STATE_SCHEMA = (
    "bs array<long>, ns array<long>, svs array<long>, trig long, hor long"
)


def _roll_update_impl(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    max_buckets: int | None,
) -> Iterator[pd.DataFrame]:
    import bisect

    from knovexlite_spark.ops.timeseries import _ewma_weights

    if state.exists:
        bs, ns, svs, trig, hor = state.get
        bs, ns, svs = list(bs), list(ns), list(svs)
    else:
        bs, ns, svs, trig, hor = [], [], [], 0, None
    trig += 1
    updated: set[int] = set()
    for pdf in pdfs:
        # pre-aggregate the batch slice per bucket so the sorted-state
        # insert cost is O(distinct buckets), not O(events) (counts and
        # sums are mergeable — round-13 advice)
        agg = pdf.groupby("__b")["__qv"].agg(["count", "sum"])
        for b, cnt, q in zip(
            agg.index, agg["count"].to_numpy(), agg["sum"].to_numpy()
        ):
            b, cnt, q = int(b), int(cnt), int(q)
            if hor is not None and b < hor:
                continue  # older than the retention horizon: DROPPED
            i = bisect.bisect_left(bs, b)
            if i < len(bs) and bs[i] == b:
                ns[i] += cnt
                svs[i] += q
            else:
                bs.insert(i, b)
                ns.insert(i, cnt)
                svs.insert(i, q)
            updated.add(b)
    if max_buckets is not None and len(bs) > max_buckets:
        # evict the oldest buckets and advance the horizon so a late
        # arrival below it cannot resurrect a partial bucket (the
        # watermark discipline: bounded state trades away
        # arbitrarily-late corrections, loudly documented)
        cut = len(bs) - max_buckets
        bs, ns, svs = bs[cut:], ns[cut:], svs[cut:]
        hor = bs[0] if hor is None else max(hor, bs[0])
        updated = {b for b in updated if b >= hor}
    state.update((bs, ns, svs, trig, hor))
    span = (ROLL_WINDOW - 1) * ROLL_STRIDE_US
    ups = sorted(updated)
    ws = _ewma_weights(ROLL_ALPHA, ROLL_WINDOW)
    bmap = {b: i for i, b in enumerate(bs)}
    rows = []
    # only buckets in [min(updated), max(updated)+span] can have a
    # touched trailing window — scan that slice, not all retained
    # history (round-13 advice: per-trigger cost tracks the batch's
    # time locality, not O(history))
    lo_i = bisect.bisect_left(bs, ups[0]) if ups else 0
    hi_i = bisect.bisect_right(bs, ups[-1] + span) if ups else 0
    for i in range(lo_i, hi_i):
        b = bs[i]
        # re-emit b iff some bucket in its trailing window was updated
        j = bisect.bisect_left(ups, b - span)
        if j >= len(ups) or ups[j] > b:
            continue
        lo = bisect.bisect_left(bs, b - span)
        frame_n = ns[lo : i + 1]
        frame_sv = svs[lo : i + 1]
        num = None
        den = None
        for lag, coef in enumerate(ws):
            ii = bmap.get(b - lag * ROLL_STRIDE_US)
            if ii is None:
                continue  # NULL lag: term and weight drop (+0.0 == noop)
            term = coef * float(svs[ii])
            num = term if num is None else num + term
            den = coef if den is None else den + coef
        rows.append(
            (
                key[0],
                trig,
                b,
                ns[i],
                svs[i],
                sum(frame_n),
                max(frame_n),
                len(frame_n),
                sum(frame_sv),
                (num / den) if den is not None and den > 0.0 else None,
            )
        )
    if rows:
        yield pd.DataFrame(
            rows,
            columns=[
                "user_id",
                "trig",
                "bucket_us",
                "n",
                "sv",
                "n_sum",
                "n_max",
                "n_count",
                "sv_sum",
                "sv_ewma",
            ],
        )


def _roll_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    return _roll_update_impl(key, pdfs, state, None)


def running_rolling(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    scale: int = 100,
    max_buckets: int | None = None,
) -> DataFrame:
    """Per-user trailing moving aggregates over 15 min event-time
    buckets, as keyed streaming state: each trigger folds the batch
    slice into per-bucket (n, sv) partials and RE-EMITS the
    window-4 trailing sum/max/count of the bucket counts, the
    trailing sum of the (quantized-integer) value sums, and the
    span-windowed EWMA for every bucket whose window changed — so
    the latest row per (user, bucket) always answers over the FULL
    history (late data re-opens exactly the buckets it touches).
    NULL timestamps and NULL values drop (the resample convention).
    Update output mode; batch twin parity pinned in tests and at the
    gate ('roll').

    ``max_buckets`` (default None = unbounded) exists for parity
    testing against the batch chain, NOT production throughput —
    unbounded state grows with a key's observed-bucket history.
    Setting it is the PRODUCTION state bound: keep only the newest N observed
    buckets per key and advance a retention horizon past evicted
    ones — a late arrival below the horizon is DROPPED, never
    resurrected as a partial bucket (the watermark discipline:
    bounded state trades away arbitrarily-late corrections; answers
    for retained buckets stay exact OVER THE RETAINED buckets — size
    max_buckets >= window + expected late slack so trailing windows
    keep their full history).  Eviction runs within the trigger
    before emission, so an over-budget batch's oldest buckets never
    emit at all."""
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.timeseries import time_bucket

    src = events.filter(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    ).select(
        "user_id",
        time_bucket(ts_col, ROLL_STRIDE_US).alias("__b"),
        F.round(F.col(value_col) * scale).cast("long").alias("__qv"),
    )
    if max_buckets is None:
        fn = _roll_update
    else:
        if max_buckets < 1:
            raise ValueError(f"max_buckets must be >= 1, got {max_buckets}")

        def fn(key, pdfs, state):
            return _roll_update_impl(key, pdfs, state, max_buckets)

    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        ROLL_OUT_SCHEMA,
        ROLL_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming per-key distinct count: HyperLogLog registers as keyed
# state — register merge is associative/commutative MAX, so micro-batch
# folds are EXACT: after any interleaving of triggers the state
# registers equal the batch hll_registers build bit-for-bit (the
# bucket/rank hash is computed JVM-SIDE by the same hll_bucket_rank
# expressions the batch build uses, so there is no Python hash to
# drift).  This completes the streaming twin set: quantiles ('quant'),
# heavy hitters ('hh'), rolling/EWMA ('roll'), distinct ('dist').
# State per key is <= 2^p registers forever; estimates use the same
# py_hll_estimate fold as the batch estimator.
# ---------------------------------------------------------------------------

DIST_P = 8  # 256 registers/key — plenty for per-user cardinalities
DIST_OUT_SCHEMA = (
    "user_id long, n_seen long, estimate double, bucket long, register long"
)
DIST_STATE_SCHEMA = "buckets array<long>, regs array<long>, n long"


def _dist_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from knovexlite_spark.ops.sketch import py_hll_estimate

    if state.exists:
        buckets, regs, n = state.get
        d = dict(zip(buckets, regs))
    else:
        d, n = {}, 0
    for pdf in pdfs:
        sub = pdf[["__hb", "__hr"]].dropna()
        n += len(sub)
        if len(sub):
            g = sub.groupby("__hb", sort=False)["__hr"].max()
            for b, r in g.items():
                b, r = int(b), int(r)
                if r > d.get(b, 0):
                    d[b] = r
    items = sorted(d.items())
    state.update(
        ([b for b, _ in items], [r for _, r in items], n)
    )
    est = py_hll_estimate(d, DIST_P)
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(items),
            "n_seen": [n] * len(items),
            "estimate": [est] * len(items),
            "bucket": [b for b, _ in items],
            "register": [r for _, r in items],
        }
    )


def running_distinct(
    events: DataFrame, item_col: str = "props"
) -> DataFrame:
    """Per-user running distinct-count sketch with <= 2^p registers of
    state per key: each trigger max-folds the batch slice's
    (bucket, rank) pairs — computed JVM-side by the exact
    ``hll_bucket_rank`` expressions — into the state registers and
    emits the user's current register table plus the running estimate
    (``py_hll_estimate``, the batch estimator's fold).  Because
    register merge is associative max, the drained state equals the
    batch ``hll_registers(group_col=user_id)`` build BIT-FOR-BIT for
    any trigger interleaving (pinned in tests and at the gate as
    'dist').  NULL items drop (COUNT DISTINCT semantics); n_seen
    counts non-null items and is strictly increasing, so the latest
    trigger's rows are the max-n_seen rows.  Update output mode."""
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.sketch import hll_bucket_rank

    b, r = hll_bucket_rank(F.col(item_col).cast("string"), p=DIST_P)
    src = events.select(
        "user_id", b.alias("__hb"), r.cast("long").alias("__hr")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _dist_update,
        DIST_OUT_SCHEMA,
        DIST_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def running_heavy_hitters(
    events: DataFrame, item_col: str = "event_type"
) -> DataFrame:
    """Per-user running top-m items with <= m counters of state per
    key: every trigger emits the user's current counter table tagged
    with n_seen (strictly increasing, so the latest trigger's rows are
    the max-n_seen rows).  Update output mode."""
    from pyspark.sql import functions as F

    src = events.select(
        "user_id", F.col(item_col).cast("string").alias("__item")
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _hh_update,
        HH_OUT_SCHEMA,
        HH_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming PROFILER: all three sketch families + the row count in ONE
# keyed state (the batch one-pass profiler's streaming twin — round-14
# verdict ask).  The four single-family twins each carry one state
# store; ingest-time corpus stats want GK + MG + HLL per key for the
# price of one: state per key is (compressed GK summary ~k points,
# MG counter table <= m items, HLL register dict <= 2^p, n), every
# trigger folds the micro-batch through the SAME kernels the batch
# profiler uses (py_gk_*, py_mg_*, JVM-side hll_bucket_rank), so after
# drain:
#   - the HLL rows equal hll_registers(group_col=...) BIT-FOR-BIT
#     (register max is associative — exact, any trigger interleaving),
#   - the GK summary keeps the rank-bracket contract vs the full
#     history (merge-legality),
#   - the MG table keeps the bracket/coverage contract,
#   - n_seen == the exact row count.
# Emitted tall (the PROFILE_SCHEMA convention, minus src — a keyed
# state IS one logical source): (user_id, n_seen, family, s, x, y, z)
# with gk: x=v y=rmin z=rmax, mg: s=item x=cnt y=err, hll: x=bucket
# y=register, stat: x=n_seen.  n_seen is strictly increasing, so the
# latest trigger's rows are the max-n_seen rows.  Update output mode.
# ---------------------------------------------------------------------------

PROF_K = 32  # GK summary budget per key (the 'quant' constant)
PROF_M = 3  # < the event_type vocabulary: trims are load-bearing
PROF_P = 8  # 256 registers/key (the 'dist' constant)
PROF_OUT_SCHEMA = (
    "user_id long, n_seen long, family string, s string, "
    "x long, y long, z long"
)
PROF_STATE_SCHEMA = (
    "vs array<long>, lo array<long>, hi array<long>, "
    "items array<string>, cnts array<long>, merr long, "
    "buckets array<long>, regs array<long>, n long"
)


def _profile_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    from knovexlite_spark.ops.quantile import (
        py_gk_build,
        py_gk_compress,
        py_gk_merge,
    )
    from knovexlite_spark.ops.sketch import py_mg_build, py_mg_merge

    if state.exists:
        vs, lo, hi, items, cnts, merr, buckets, regs, n = state.get
        summary = list(zip(vs, lo, hi))
        table = (list(zip(items, cnts)), merr)
        d = dict(zip(buckets, regs))
    else:
        summary, table, d, n = [], ([], 0), {}, 0
    vals: list[int] = []
    mitems: list[str] = []
    for pdf in pdfs:
        n += len(pdf)
        vals.extend(int(x) for x in pdf["__qv"].dropna())
        mitems.extend(str(x) for x in pdf["__item"].dropna())
        sub = pdf[["__hb", "__hr"]].dropna()
        if len(sub):
            g = sub.groupby("__hb", sort=False)["__hr"].max()
            for b, r in g.items():
                b, r = int(b), int(r)
                if r > d.get(b, 0):
                    d[b] = r
    batch = py_gk_build(vals, k=PROF_K)
    merged = py_gk_merge([s for s in (summary, batch) if s])
    summary = py_gk_compress(merged, k=PROF_K)
    rows, merr = py_mg_merge(
        [table, py_mg_build(mitems, PROF_M)], PROF_M
    )
    hitems = sorted(d.items())
    state.update((
        [p[0] for p in summary],
        [p[1] for p in summary],
        [p[2] for p in summary],
        [it for it, _ in rows],
        [c for _, c in rows],
        merr,
        [b for b, _ in hitems],
        [r for _, r in hitems],
        n,
    ))
    recs = [(key[0], n, "stat", None, n, None, None)]
    for v, rmin, rmax in summary:
        recs.append((key[0], n, "gk", None, v, rmin, rmax))
    for it, c in rows:
        recs.append((key[0], n, "mg", it, c, merr, None))
    for b, r in hitems:
        recs.append((key[0], n, "hll", None, b, r, None))
    yield pd.DataFrame(
        recs,
        columns=["user_id", "n_seen", "family", "s", "x", "y", "z"],
    )


def running_profile(
    events: DataFrame,
    value_col: str = "value",
    item_col: str = "event_type",
    distinct_col: str = "props",
    scale: int = 100,
) -> DataFrame:
    """Per-user running CORPUS PROFILE — GK quantile summary (+`scale`
    quantization, the gk integral contract), Misra-Gries top items,
    HLL distinct registers, and the exact row count — in ONE keyed
    state (the batch :func:`~knovexlite_spark.ops.profile.profile_local_by_key`'s
    streaming twin).  Per-family NULL handling matches the batch
    profiler: NULL values/items/props drop from their sketch;
    ``n_seen`` counts ALL rows (the stat convention).  After the
    source drains (pinned in tests and at the gate as 'profs'): HLL
    registers == the batch grouped build bit-for-bit, GK brackets and
    MG bracket/coverage hold vs the exact full history, n_seen is
    exact.  Update output mode; the latest rows per key are the
    max-n_seen rows."""
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.sketch import hll_bucket_rank

    b, r = hll_bucket_rank(F.col(distinct_col).cast("string"), p=PROF_P)
    src = events.select(
        "user_id",
        F.round(F.col(value_col) * scale).cast("long").alias("__qv"),
        F.col(item_col).cast("string").alias("__item"),
        b.alias("__hb"),
        r.cast("long").alias("__hr"),
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _profile_update,
        PROF_OUT_SCHEMA,
        PROF_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
