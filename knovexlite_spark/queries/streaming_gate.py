"""Streaming correctness corpus: Structured Streaming queries driven to
completion (availableNow -> memory sink) and checked against batch SQL
oracles — pinning that the incremental execution computes exactly the
batch semantics (Q18/Q19).
"""

from __future__ import annotations

import itertools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.streaming.events import (
    read_events_stream,
    run_to_memory,
    session_windows,
    sliding_counts,
    tumbling_counts,
)

_counter = itertools.count()


def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    name = f"gate_tumble_{next(_counter)}"
    run_to_memory(tumbling_counts(read_events_stream(spark, sf_dir)), name)
    return spark.table(name)


def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (30 min gap) per user; output
    (user_id, session_start, n_events)."""
    name = f"gate_sess_{next(_counter)}"
    run_to_memory(session_windows(read_events_stream(spark, sf_dir)), name)
    return spark.table(name).select(
        "user_id", F.col("session_start").alias("session_start"), "n_events"
    )


def q_stream_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling + session streaming windows in ONE tagged gate row (the
    driver records at most 50 queries — round-1 forensics).  Both streams
    run availableNow to a memory sink; results are normalized to a common
    (kind, key, t, c, s) schema and unioned."""
    tumble = q_stream_tumbling(spark, sf_dir).select(
        F.lit("tumbling").alias("kind"),
        F.col("event_type").alias("key"),
        F.col("w").alias("t"),
        F.col("c").cast("long").alias("c"),
        F.col("s"),
    )
    sess = q_stream_session(spark, sf_dir).select(
        F.lit("session").alias("kind"),
        F.col("user_id").cast("string").alias("key"),
        F.col("session_start").alias("t"),
        F.col("n_events").cast("long").alias("c"),
        F.lit(None).cast("string").alias("s"),
    )
    name = f"gate_slide_{next(_counter)}"
    run_to_memory(sliding_counts(read_events_stream(spark, sf_dir)), name)
    slide = spark.table(name).select(
        F.lit("sliding").alias("kind"),
        F.col("event_type").alias("key"),
        F.col("w").alias("t"),
        F.col("c").cast("long").alias("c"),
        F.lit(None).cast("string").alias("s"),
    )
    return tumble.unionAll(sess).unionAll(slide)


def q_stream_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom keyed-state operators (applyInPandasWithState) at the
    gate, two members in one tagged row:

    - 'stats': per-user running stats streamed to a memory sink in
      update mode; the LAST update row per user (max n_events — the
      count is strictly increasing) must equal the batch aggregation.
      Compared columns are the cross-engine-exact ones: the event
      count and the max (a passthrough double); the Python-accumulated
      float sum stays in the operator but out of the hash.
    - 'quant' (round 11): the streaming GK quantile state — per-user
      running p50/p90/p99 with ~k points of state per key, every
      micro-batch merged through the py_gk kernels.  After the source
      drains, the latest row per user is held to the batch-history
      contract: n_seen == the exact event count, and each answer's
      exact rank lands within max(3, 10%*n) of its target (the pinned
      test budget).  max_value carries the verdict count (3.0 = all
      three fracs in budget); the oracle pins the all-3s expectation —
      the sketch state is batch-layout-dependent, its accuracy
      contract is not (the approx_sketches 'gk_acc' pattern)."""
    from pyspark.sql import Window

    from knovexlite_spark.engine import Engine
    from knovexlite_spark.streaming.stateful import (
        running_quantiles,
        running_user_stats,
    )

    name = f"gate_state_{next(_counter)}"
    run_to_memory(running_user_stats(read_events_stream(spark, sf_dir)), name, mode="update")
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    stats = (
        spark.table(name)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.lit("stats").alias("kind"),
            "user_id",
            F.col("n_events").cast("long").alias("n_events"),
            "max_value",
        )
    )
    qname = f"gate_state_{next(_counter)}"
    run_to_memory(
        running_quantiles(read_events_stream(spark, sf_dir)),
        qname,
        mode="update",
    )
    wq = Window.partitionBy("user_id").orderBy(F.col("n_seen").desc())
    latest = (
        spark.table(qname)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_seen", "p50", "p90", "p99")
    )
    events = Engine.for_dir(spark, sf_dir).table("events")
    qv = events.select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("qv")
    )
    per_user = (
        qv.join(F.broadcast(latest), "user_id")
        .groupBy("user_id", "n_seen", "p50", "p90", "p99")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("qv") <= F.col("p50")).cast("long")).alias("r50"),
            F.sum((F.col("qv") <= F.col("p90")).cast("long")).alias("r90"),
            F.sum((F.col("qv") <= F.col("p99")).cast("long")).alias("r99"),
        )
    )
    tol = F.greatest(
        F.lit(3).cast("long"), F.ceil(F.col("n") * 0.10).cast("long")
    )

    def _ok(rank_col: str, frac: float):
        target = F.greatest(
            F.lit(1).cast("long"), F.ceil(F.col("n") * frac).cast("long")
        )
        return (F.abs(F.col(rank_col) - target) <= tol).cast("long")

    quant = per_user.select(
        F.lit("quant").alias("kind"),
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        (
            (F.col("n_seen") == F.col("n")).cast("long")
            * (_ok("r50", 0.5) + _ok("r90", 0.9) + _ok("r99", 0.99))
        )
        .cast("double")
        .alias("max_value"),
    )
    # 'hh' (round 11): the streaming Misra-Gries state — per-user top
    # event types with <= m counters of state, every micro-batch
    # merged through the py_mg kernels (batch-twin parity pinned in
    # tests).  After drain, the latest counter table per user is held
    # to the FULL-history contract: (1) n_seen == the exact event
    # count, (2) every kept item's bracket cnt <= true <= cnt + err,
    # (3) every absent item has true <= err (coverage).  max_value
    # carries the verdict count (3.0 = all three) — state is
    # batch-layout-dependent, the contract is not (the 'quant'
    # pattern; m=3 < the event_type vocabulary, so trims and error
    # accounting are load-bearing, not decorative).
    from knovexlite_spark.streaming.stateful import running_heavy_hitters

    hname = f"gate_state_{next(_counter)}"
    run_to_memory(
        running_heavy_hitters(read_events_stream(spark, sf_dir)),
        hname,
        mode="update",
    )
    hh_latest = (
        spark.table(hname)
        .withColumn("mx", F.max("n_seen").over(Window.partitionBy("user_id")))
        .filter(F.col("n_seen") == F.col("mx"))
        .select("user_id", "n_seen", "item", "cnt", "err")
    )
    # NULL event_types are EXCLUDED from the exact side: the operator's
    # documented contract drops NULL items from n_seen (py_mg_build),
    # so an exact side counting them would fail the n_seen == n_total
    # check for behavior that is the contract, not a bug — the gate
    # pins the operator's stated semantics, not fixture nullability
    # (round-11 ADVICE; the oracle applies the same filter).
    exact_it = events.filter(F.col("event_type").isNotNull()).groupBy(
        "user_id", F.col("event_type").cast("string").alias("item")
    ).agg(F.count("*").cast("long").alias("true_c"))
    totals = exact_it.groupBy("user_id").agg(
        F.sum("true_c").cast("long").alias("n_total")
    )
    kept = hh_latest.join(exact_it, ["user_id", "item"], "left")
    per_user_hh = kept.groupBy("user_id", "n_seen", "err").agg(
        F.min(
            (
                (F.col("cnt") <= F.coalesce(F.col("true_c"), F.lit(0)))
                & (
                    F.coalesce(F.col("true_c"), F.lit(0))
                    <= F.col("cnt") + F.col("err")
                )
            ).cast("long")
        ).alias("bracket_ok")
    )
    # coverage: absent items (no kept row) must not exceed err
    absent = exact_it.join(
        hh_latest.select("user_id", "item", F.lit(1).alias("__kept")),
        ["user_id", "item"],
        "left",
    ).filter(F.col("__kept").isNull())
    cov = absent.join(
        per_user_hh.select("user_id", "err"), "user_id"
    ).groupBy("user_id").agg(
        F.min((F.col("true_c") <= F.col("err")).cast("long")).alias("cov_ok")
    )
    hh = (
        per_user_hh.join(totals, "user_id")
        .join(cov, "user_id", "left")
        .select(
            F.lit("hh").alias("kind"),
            "user_id",
            F.col("n_total").alias("n_events"),
            (
                (F.col("n_seen") == F.col("n_total")).cast("long")
                + F.col("bracket_ok")
                + F.coalesce(F.col("cov_ok"), F.lit(1))
            )
            .cast("double")
            .alias("max_value"),
        )
    )
    # 'roll' (round 13): the streaming rolling/EWMA state — per-user
    # per-bucket resample partials with trailing window-4 aggregates
    # and a span-windowed EWMA re-emitted for every touched window
    # (streaming/stateful.running_rolling; batch<->stream parity for
    # the analytics tier, the way 'quant'/'hh' did the sketches).
    # After drain, the latest row per (user, bucket) must equal the
    # batch chain resample -> rolling(frame='range') ++ gap_fill ->
    # ewma EXACTLY: verdict count 3.0 = bucket coverage + integer
    # window aggs + BIT-EXACT EWMA (same IEEE fold on both sides);
    # n_events carries the user's observed-bucket count.
    from knovexlite_spark.ops.timeseries import (
        ewma,
        gap_fill,
        resample,
        rolling,
    )
    from knovexlite_spark.streaming.stateful import (
        ROLL_ALPHA,
        ROLL_STRIDE_US,
        ROLL_WINDOW,
        running_rolling,
    )

    rname = f"gate_state_{next(_counter)}"
    run_to_memory(
        running_rolling(read_events_stream(spark, sf_dir)),
        rname,
        mode="update",
    )
    r_latest = (
        spark.table(rname)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "bucket_us").orderBy(
                    F.col("trig").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "trig")
    )
    ev = events.filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("long").alias("qv"),
    )
    res = resample(
        ev,
        "ts",
        ROLL_STRIDE_US,
        ["user_id"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("qv").alias("sv")],
    )
    rw = ROLL_WINDOW
    rolled = rolling(
        res,
        ["user_id"],
        {"n": ["sum", "max", "count"], "sv": ["sum"]},
        rw,
        frame="range",
        stride=ROLL_STRIDE_US,
    )
    ew = ewma(
        gap_fill(res, ROLL_STRIDE_US, ["user_id"], fill={"n": None, "sv": None}),
        ["user_id"],
        "sv",
        alpha=ROLL_ALPHA,
        window=rw,
    ).select("user_id", "bucket_us", F.col(f"sv_ewma{rw}").alias("b_ewma"))
    twin = rolled.join(ew, ["user_id", "bucket_us"]).select(
        "user_id",
        "bucket_us",
        F.col("n").alias("b_n"),
        F.col("sv").alias("b_sv"),
        F.col(f"n_sum{rw}").alias("b_n_sum"),
        F.col(f"n_max{rw}").alias("b_n_max"),
        F.col(f"n_count{rw}").alias("b_n_count"),
        F.col(f"sv_sum{rw}").alias("b_sv_sum"),
        "b_ewma",
    )
    joined = r_latest.join(twin, ["user_id", "bucket_us"], "full_outer")

    def _v(cond):
        return F.min(F.coalesce(cond.cast("long"), F.lit(0)))

    roll = joined.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        (
            _v(F.col("n").isNotNull() & F.col("b_n").isNotNull())
            + _v(
                (F.col("n") == F.col("b_n"))
                & (F.col("sv") == F.col("b_sv"))
                & (F.col("n_sum") == F.col("b_n_sum"))
                & (F.col("n_max") == F.col("b_n_max"))
                & (F.col("n_count") == F.col("b_n_count"))
                & (F.col("sv_sum") == F.col("b_sv_sum"))
            )
            + _v(F.col("sv_ewma") == F.col("b_ewma"))
        )
        .cast("double")
        .alias("max_value"),
    ).select(F.lit("roll").alias("kind"), "user_id", "n_events", "max_value")
    # 'dist' (round 14): the streaming HLL distinct state — per-user
    # registers max-folded per trigger (bucket/rank computed JVM-side
    # by the SAME hll_bucket_rank expressions as the batch build), so
    # after drain the state must equal hll_registers(group_col=user_id)
    # BIT-FOR-BIT for any trigger interleaving (register merge is
    # associative max — this member is exact equality, not a tolerance
    # contract).  Verdict count 3.0 per user: (1) n_seen == the exact
    # non-null item count, (2) register-table equality vs the batch
    # build, (3) the running estimate within max(2, 15%) of the exact
    # per-user COUNT(DISTINCT).  Completes the streaming twin set:
    # quant / hh / roll / dist.
    from knovexlite_spark.ops.sketch import hll_registers
    from knovexlite_spark.streaming.stateful import DIST_P, running_distinct

    dname = f"gate_state_{next(_counter)}"
    run_to_memory(
        running_distinct(read_events_stream(spark, sf_dir)),
        dname,
        mode="update",
    )
    d_latest = (
        spark.table(dname)
        .withColumn("mx", F.max("n_seen").over(Window.partitionBy("user_id")))
        .filter(F.col("n_seen") == F.col("mx"))
        .select("user_id", "n_seen", "estimate", "bucket", "register")
    )
    gregs = hll_registers(
        events.select(
            "user_id", F.col("props").cast("string").alias("it")
        ),
        "it",
        p=DIST_P,
        group_col="user_id",
    ).select(F.col("grp").alias("user_id"), "bucket", "register")
    reg_cmp = d_latest.select("user_id", "bucket", "register").join(
        gregs.withColumnRenamed("register", "b_register"),
        ["user_id", "bucket"],
        "full_outer",
    )
    # coalesce the predicate (the _v helper's rule): on a STREAM-ONLY
    # bucket the batch side is NULL, `register == b_register` is NULL,
    # and F.min skips NULLs — a spurious extra register in the
    # streaming state would otherwise pass the bit-exactness gate
    # (round-14 advice); with the coalesce both full-outer directions
    # count as failures
    reg_ok = reg_cmp.groupBy("user_id").agg(
        F.min(
            F.coalesce(
                (
                    F.col("register").isNotNull()
                    & (F.col("register") == F.col("b_register"))
                ).cast("long"),
                F.lit(0),
            )
        ).alias("reg_ok")
    )
    exact_d = events.filter(F.col("props").isNotNull()).groupBy(
        "user_id"
    ).agg(
        F.count("*").cast("long").alias("n_exact"),
        F.countDistinct("props").cast("long").alias("d_exact"),
    )
    dist = (
        d_latest.select("user_id", "n_seen", "estimate")
        .distinct()
        .join(reg_ok, "user_id")
        .join(exact_d, "user_id")
        .select(
            F.lit("dist").alias("kind"),
            "user_id",
            F.col("n_exact").alias("n_events"),
            (
                (F.col("n_seen") == F.col("n_exact")).cast("long")
                + F.col("reg_ok")
                + (
                    F.abs(F.col("estimate") - F.col("d_exact"))
                    <= F.greatest(F.lit(2.0), F.col("d_exact") * 0.15)
                ).cast("long")
            )
            .cast("double")
            .alias("max_value"),
        )
    )
    # 'profs' (round 15): the streaming PROFILER twin — GK + MG + HLL
    # + the row count in ONE keyed state (streaming/stateful.py
    # running_profile, the batch one-pass profiler's streaming side).
    # Verdict count 4.0 per user after drain:
    #   (1) n_seen == the exact row count,
    #   (2) GK brackets hold vs the exact quantized history AND the
    #       max rmax equals the non-null value count (merge-legality:
    #       state stayed ~k points per key across every trigger),
    #   (3) MG bracket/coverage contract vs exact item counts (m=3 <
    #       the event_type vocabulary: trims fire),
    #   (4) HLL register table == the batch grouped build BIT-FOR-BIT
    #       (same registers as the 'dist' member's batch side — the
    #       same p/salt — so `gregs` is reused; NULL-coalesced in both
    #       full-outer directions per the round-14 advice fix).
    from knovexlite_spark.streaming.stateful import running_profile

    pname = f"gate_state_{next(_counter)}"
    run_to_memory(
        running_profile(read_events_stream(spark, sf_dir)),
        pname,
        mode="update",
    )
    p_latest = (
        spark.table(pname)
        .withColumn(
            "mx", F.max("n_seen").over(Window.partitionBy("user_id"))
        )
        .filter(F.col("n_seen") == F.col("mx"))
        .select("user_id", "n_seen", "family", "s", "x", "y", "z")
        .localCheckpoint(eager=False)
    )
    p_totals = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_all"),
        F.count("value").cast("long").alias("n_vals"),
    )
    p_n_ok = (
        p_latest.filter(F.col("family") == "stat")
        .join(p_totals, "user_id")
        .select(
            "user_id",
            (F.col("x") == F.col("n_all")).cast("long").alias("n_ok"),
        )
    )
    p_qv = events.filter(F.col("value").isNotNull()).select(
        "user_id", F.round(F.col("value") * 100).cast("long").alias("qv")
    )
    p_gk_rows = p_latest.filter(F.col("family") == "gk").select(
        "user_id", F.col("x").alias("v"), F.col("y").alias("lo"),
        F.col("z").alias("hi"),
    )
    p_gk_ok = (
        p_gk_rows.join(p_qv, "user_id")
        .groupBy("user_id", "v", "lo", "hi")
        .agg(
            F.sum((F.col("qv") <= F.col("v")).cast("long")).alias("le"),
            F.sum((F.col("qv") < F.col("v")).cast("long")).alias("lt"),
        )
        .join(p_totals, "user_id")
        .groupBy("user_id")
        .agg(
            (
                F.min(
                    (
                        (F.col("lo") <= F.col("le"))
                        & (F.col("hi") >= F.col("lt") + 1)
                    ).cast("long")
                )
                * (F.max("hi") == F.max("n_vals")).cast("long")
            ).alias("gk_ok")
        )
    )
    p_exact_it = events.filter(F.col("event_type").isNotNull()).groupBy(
        "user_id", F.col("event_type").cast("string").alias("item")
    ).agg(F.count("*").cast("long").alias("true_c"))
    p_mg_rows = p_latest.filter(F.col("family") == "mg").select(
        "user_id", F.col("s").alias("item"), F.col("x").alias("cnt"),
        F.col("y").alias("err"),
    )
    p_brack = (
        p_mg_rows.join(p_exact_it, ["user_id", "item"], "left")
        .groupBy("user_id", "err")
        .agg(
            F.min(
                (
                    (F.col("cnt") <= F.coalesce(F.col("true_c"), F.lit(0)))
                    & (
                        F.coalesce(F.col("true_c"), F.lit(0))
                        <= F.col("cnt") + F.col("err")
                    )
                ).cast("long")
            ).alias("bracket_ok")
        )
    )
    p_absent = p_exact_it.join(
        p_mg_rows.select("user_id", "item", F.lit(1).alias("__kept")),
        ["user_id", "item"],
        "left",
    ).filter(F.col("__kept").isNull())
    p_cov = p_absent.join(
        p_brack.select("user_id", "err"), "user_id"
    ).groupBy("user_id").agg(
        F.min((F.col("true_c") <= F.col("err")).cast("long")).alias("cov_ok")
    )
    p_mg_ok = p_brack.join(p_cov, "user_id", "left").select(
        "user_id",
        (
            F.col("bracket_ok") * F.coalesce(F.col("cov_ok"), F.lit(1))
        ).alias("mg_ok"),
    )
    p_reg_cmp = (
        p_latest.filter(F.col("family") == "hll")
        .select("user_id", F.col("x").alias("bucket"), F.col("y").alias("register"))
        .join(
            gregs.withColumnRenamed("register", "b_register"),
            ["user_id", "bucket"],
            "full_outer",
        )
    )
    p_hll_ok = p_reg_cmp.groupBy("user_id").agg(
        F.min(
            F.coalesce(
                (
                    F.col("register").isNotNull()
                    & (F.col("register") == F.col("b_register"))
                ).cast("long"),
                F.lit(0),
            )
        ).alias("hll_ok")
    )
    profs = (
        p_n_ok.join(p_gk_ok, "user_id")
        .join(p_mg_ok, "user_id")
        .join(p_hll_ok, "user_id")
        .join(p_totals, "user_id")
        .select(
            F.lit("profs").alias("kind"),
            "user_id",
            F.col("n_all").alias("n_events"),
            (
                F.col("n_ok") + F.col("gk_ok") + F.col("mg_ok")
                + F.col("hll_ok")
            )
            .cast("double")
            .alias("max_value"),
        )
    )
    return (
        stats.unionAll(quant)
        .unionAll(hh)
        .unionAll(roll)
        .unionAll(dist)
        .unionAll(profs)
    )


ORACLES = {
    # keyed running state drained == batch aggregation ('stats'), plus
    # the streaming-quantile accuracy contract ('quant': verdict count
    # 3.0 per user — every user's p50/p90/p99 within the rank budget
    # and n_seen == the exact history count)
    "stream_stateful": """
        SELECT 'stats' AS kind, user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(value) AS max_value
        FROM events GROUP BY user_id
        UNION ALL
        SELECT 'quant', user_id, CAST(COUNT(*) AS BIGINT),
               CAST(3 AS DOUBLE)
        FROM events GROUP BY user_id
        UNION ALL
        -- NULL event_types excluded on BOTH sides: the operator drops
        -- NULL items (documented contract), so the exact count the
        -- n_seen check pins must drop them too
        SELECT 'hh', user_id, CAST(COUNT(*) AS BIGINT),
               CAST(3 AS DOUBLE)
        FROM events WHERE event_type IS NOT NULL GROUP BY user_id
        UNION ALL
        -- 'roll': streaming rolling/EWMA vs the batch chain — bucket
        -- coverage + integer window aggs + bit-exact EWMA, verdict
        -- count 3.0 per user; n_events = the user's observed 15 min
        -- bucket count (NULL ts/value rows drop on both sides: the
        -- operator contract)
        SELECT 'roll', user_id,
               CAST(COUNT(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))
                          // 900000000) AS BIGINT),
               CAST(3 AS DOUBLE)
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY user_id
        UNION ALL
        -- 'dist': streaming HLL distinct — n_seen exactness, BIT-exact
        -- register equality vs the batch build, estimate within
        -- max(2, 15%) of exact; verdict count 3.0 per user (NULL items
        -- drop on both sides: COUNT DISTINCT semantics)
        SELECT 'dist', user_id, CAST(COUNT(*) AS BIGINT),
               CAST(3 AS DOUBLE)
        FROM events WHERE props IS NOT NULL GROUP BY user_id
        UNION ALL
        -- 'profs' (round 15): the streaming PROFILER twin — GK + MG +
        -- HLL + row count in ONE keyed state; verdict count 4.0 per
        -- user (n_seen exact, GK brackets + total, MG bracket/coverage,
        -- HLL registers bit-exact vs the batch grouped build)
        SELECT 'profs', user_id, CAST(COUNT(*) AS BIGINT),
               CAST(4 AS DOUBLE)
        FROM events GROUP BY user_id
    """,
    # tumbling must equal the batch q18 semantics; session is the
    # gaps-and-islands formulation of 30-min-gap sessionization
    # (session_start = min ts in the island).
    "stream_windows": """
        SELECT 'tumbling' AS kind, event_type AS key,
               DATE_TRUNC('HOUR', ts) AS t,
               CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS s
        FROM events GROUP BY 2, 3
        UNION ALL
        SELECT 'session' AS kind, CAST(user_id AS STRING) AS key,
               session_start AS t, CAST(n_events AS BIGINT) AS c,
               CAST(NULL AS STRING) AS s
        FROM (
            WITH flagged AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                       CASE WHEN ts - LAG(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id)
                            > INTERVAL 30 MINUTE
                            OR LAG(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       THEN 1 ELSE 0 END AS new_s
                FROM events
            ),
            islands AS (
                SELECT user_id, ts,
                       SUM(new_s) OVER (
                           PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sess_id
                FROM flagged
            )
            SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
            FROM islands GROUP BY user_id, sess_id
        ) sessions
        UNION ALL
        -- sliding 1h windows every 30min: each event lands in the two
        -- 30-min-grid windows covering it (both engines align the grid
        -- to midnight/epoch, which coincide for 30-min buckets)
        SELECT 'sliding' AS kind, event_type AS key, w AS t,
               CAST(COUNT(*) AS BIGINT) AS c, CAST(NULL AS STRING) AS s
        FROM (
            SELECT event_type,
                   time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP)) AS w
            FROM events
            UNION ALL
            SELECT event_type,
                   time_bucket(INTERVAL 30 MINUTES, CAST(ts AS TIMESTAMP))
                       - INTERVAL 30 MINUTES
            FROM events
        ) sliding GROUP BY 2, 3
    """,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stream_windows": q_stream_windows,
        "stream_stateful": q_stream_stateful,
    }


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
