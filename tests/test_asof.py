"""As-of and range joins (ops/asof.py) vs DuckDB oracles.

These operators have no gate slot (the driver records 50 rows and all
are taken), so the DuckDB comparison runs HERE: the same frames go
through Spark's asof_join / range_join and DuckDB's native ASOF JOIN /
inequality join, and the row sets must match exactly."""

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from knovexlite_spark.ops.asof import asof_join, range_join

QUOTES = [  # (sym, ts, px) — unique (sym, ts)
    ("a", 10, 1.0), ("a", 20, 2.0), ("a", 35, 3.0),
    ("b", 5, 10.0), ("b", 30, 20.0),
]
TRADES = [  # (sym, ts, qty)
    ("a", 9, 1), ("a", 10, 2), ("a", 25, 3), ("a", 40, 4),
    ("b", 4, 5), ("b", 30, 6), ("b", 100, 7),
    ("c", 50, 8),  # key with no quotes at all
]


def _frames(spark):
    quotes = spark.createDataFrame(QUOTES, "sym string, ts long, px double")
    trades = spark.createDataFrame(TRADES, "sym string, ts long, qty long")
    return trades, quotes


def test_asof_backward_matches_duckdb(spark):
    trades, quotes = _frames(spark)
    got = {
        (r["sym"], r["ts"]): (r["px"], r["ts_r"])
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]))
    con.register("q", pd.DataFrame(QUOTES, columns=["sym", "ts", "px"]))
    want = {
        (sym, ts): (px, qts)
        for sym, ts, px, qts in con.execute(
            """SELECT t.sym, t.ts, q.px, q.ts
               FROM t ASOF LEFT JOIN q
               ON t.sym = q.sym AND t.ts >= q.ts"""
        ).fetchall()
    }
    assert got == want
    # spot semantics: tie matches; pre-first-quote and unknown keys NULL
    assert got[("a", 10)] == (1.0, 10)
    assert got[("a", 9)] == (None, None)
    assert got[("c", 50)] == (None, None)


def test_asof_forward_and_tolerance(spark):
    trades, quotes = _frames(spark)
    fwd = {
        (r["sym"], r["ts"]): r["ts_r"]
        for r in asof_join(
            trades, quotes, on="ts", by=("sym",), direction="forward"
        ).collect()
    }
    # forward: earliest quote at-or-after the trade
    assert fwd[("a", 9)] == 10 and fwd[("a", 10)] == 10
    assert fwd[("a", 25)] == 35 and fwd[("a", 40)] is None
    tol = {
        (r["sym"], r["ts"]): r["ts_r"]
        for r in asof_join(
            trades, quotes, on="ts", by=("sym",), tolerance=5
        ).collect()
    }
    # backward with |dt| <= 5: the 25->20 match survives, 40->35 does,
    # b 100 -> 30 (dt 70) is nulled
    assert tol[("a", 25)] == 20 and tol[("a", 40)] == 35
    assert tol[("b", 100)] is None


def test_asof_plan_single_exchange_window(spark):
    trades, quotes = _frames(spark)
    plan = (
        asof_join(trades, quotes, on="ts", by=("sym",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hash exchange on the key feeding a streaming-frame Window;
    # no join operator of any kind appears
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan
    for node in ("SortMergeJoin", "BroadcastHashJoin", "NestedLoop", "Cartesian"):
        assert node not in plan, node


INTERVALS = [  # (sym, start, end, tag)
    ("a", 0, 10, "early"), ("a", 8, 30, "mid"), ("a", 100, 200, "late"),
    ("b", 0, 1000, "wide"),
]


def test_range_join_matches_duckdb_inequality_join(spark):
    trades, _ = _frames(spark)
    iv = spark.createDataFrame(
        INTERVALS, "sym string, start long, end long, tag string"
    )
    got = {
        (r["sym"], r["ts"], r["tag"])
        for r in range_join(
            trades, iv, point_col="ts", by=("sym",), bucket_width=7
        ).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]))
    con.register("iv", pd.DataFrame(INTERVALS, columns=["sym", "start", "end", "tag"]))
    want = {
        tuple(r)
        for r in con.execute(
            """SELECT t.sym, t.ts, iv.tag FROM t JOIN iv
               ON t.sym = iv.sym AND t.ts BETWEEN iv.start AND iv.end"""
        ).fetchall()
    }
    assert got == want and ("a", 9, "early") in got and ("a", 9, "mid") in got


def test_range_join_plan_has_no_nested_loop(spark):
    trades, _ = _frames(spark)
    iv = spark.createDataFrame(
        INTERVALS, "sym string, start long, end long, tag string"
    )
    plan = (
        range_join(trades, iv, point_col="ts", by=("sym",), bucket_width=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


from hypothesis import given, settings
from hypothesis import strategies as st

_keys = st.sampled_from(["k1", "k2", "k3"])
_rights = st.dictionaries(
    st.tuples(_keys, st.integers(0, 60)),
    st.one_of(st.none(), st.integers(0, 9)),  # None = NULL payload
    min_size=0, max_size=12,
)
_lefts = st.lists(
    st.tuples(_keys, st.integers(0, 60)), min_size=1, max_size=12
)


@settings(max_examples=10, deadline=None)
@given(rights=_rights, lefts=_lefts)
def test_asof_property_matches_duckdb(spark, rights, lefts):
    """Cross-engine property: for ANY generated frames (unique right
    (key, ts) — tie order among duplicate right rows is unspecified in
    both engines), Spark asof_join == DuckDB ASOF LEFT JOIN."""
    rrows = [
        (k, ts, None if v is None else float(v))
        for (k, ts), v in rights.items()
    ]
    lrows = [(k, ts, i) for i, (k, ts) in enumerate(lefts)]
    quotes = spark.createDataFrame(
        rrows or [("zz", -1, 0.0)], "sym string, ts long, px double"
    )
    trades = spark.createDataFrame(lrows, "sym string, ts long, qty long")
    got = {
        (r["sym"], r["ts"], r["qty"]): (r["px"], r["ts_r"])
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    }
    con = duckdb.connect()
    con.register("t", pd.DataFrame(lrows, columns=["sym", "ts", "qty"]))
    con.register(
        "q", pd.DataFrame(rrows or [("zz", -1, 0.0)], columns=["sym", "ts", "px"])
    )
    want = {
        (sym, ts, qty): (px, qts)
        for sym, ts, qty, px, qts in con.execute(
            """SELECT t.sym, t.ts, t.qty, q.px, q.ts
               FROM t ASOF LEFT JOIN q
               ON t.sym = q.sym AND t.ts >= q.ts"""
        ).fetchall()
    }
    assert got == want


def test_asof_on_timestamp_column_and_global_key(spark):
    """The ordering column may be a TIMESTAMP (tolerance compares via
    the numeric cast = epoch seconds), and by=() is the documented
    global as-of for dimension-sized frames."""
    q = spark.createDataFrame(
        [("2024-01-01 10:00:00", 1.0), ("2024-01-01 12:00:00", 2.0)],
        "ts string, px double",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "px")
    t = spark.createDataFrame(
        [("2024-01-01 09:59:00", 1), ("2024-01-01 11:00:00", 2),
         ("2024-01-01 12:00:00", 3)],
        "ts string, qty long",
    ).select(F.col("ts").cast("timestamp").alias("ts"), "qty")
    got = {r["qty"]: r["px"] for r in asof_join(t, q, on="ts").collect()}
    assert got == {1: None, 2: 1.0, 3: 2.0}
    # tolerance in seconds: the 11:00 trade is 3600s after the 10:00
    # quote; a 1800s tolerance nulls it, 7200s keeps it
    tol = {
        r["qty"]: r["px"]
        for r in asof_join(t, q, on="ts", tolerance=1800).collect()
    }
    assert tol == {1: None, 2: None, 3: 2.0}


def test_asof_null_payload_not_backfilled(spark):
    """A matched right row whose payload is legitimately NULL must
    yield NULL — not a back-fill from an OLDER right row (the struct
    carry preserves intra-row NULLs; per-column F.last would not)."""
    quotes = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 20, None), ("a", 30, 3.0)],
        "sym string, ts long, px double",
    )
    trades = spark.createDataFrame(
        [("a", 15, 1), ("a", 25, 2), ("a", 35, 3)],
        "sym string, ts long, qty long",
    )
    got = {
        r["qty"]: (r["px"], r["ts_r"])
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    }
    # trade@25 matches quote@20 whose px is NULL -> (None, 20), NOT (1.0, ...)
    assert got == {1: (1.0, 10), 2: (None, 20), 3: (3.0, 30)}


def test_asof_int64_beyond_double_precision(spark):
    """Nanosecond-epoch longs above 2^53 collapse under a double cast;
    the native-typed ordering and tolerance must still separate them."""
    base = 1_700_000_000_000_000_000  # ns epoch, > 2^53
    quotes = spark.createDataFrame(
        [("a", base, 1.0), ("a", base + 1, 2.0), ("a", base + 2, 3.0)],
        "sym string, ts long, px double",
    )
    trades = spark.createDataFrame(
        [("a", base + 1, 1)], "sym string, ts long, qty long"
    )
    [row] = asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    assert (row["px"], row["ts_r"]) == (2.0, base + 1)
    # tolerance=0 at native precision: only the exact-ts quote survives
    [row] = asof_join(
        trades, quotes, on="ts", by=("sym",), tolerance=0
    ).collect()
    assert (row["px"], row["ts_r"]) == (2.0, base + 1)
    # forward from base: earliest at-or-after is base itself
    t2 = spark.createDataFrame([("a", base, 9)], "sym string, ts long, qty long")
    [row] = asof_join(t2, quotes, on="ts", by=("sym",), direction="forward").collect()
    assert (row["px"], row["ts_r"]) == (1.0, base)


def test_asof_collision_suffix_chains_and_reserved_raises(spark):
    import pytest

    quotes = spark.createDataFrame([("a", 10, 1.0)], "sym string, ts long, px double")
    # left already holds px AND px_r: the rename chains to px_r_r
    trades = spark.createDataFrame(
        [("a", 15, 7.0, 8.0)], "sym string, ts long, px double, px_r double"
    )
    out = asof_join(trades, quotes, on="ts", by=("sym",))
    assert out.columns.count("px_r_r") == 1
    assert len(out.columns) == len(set(out.columns))
    [row] = out.collect()
    assert (row["px"], row["px_r"], row["px_r_r"]) == (7.0, 8.0, 1.0)
    # the reserved matched-ts output column colliding with a left column
    # is a loud error, not a duplicate-name frame
    bad = spark.createDataFrame([("a", 15, 0.0)], "sym string, ts long, ts_r double")
    with pytest.raises(ValueError, match="ts_r"):
        asof_join(bad, quotes, on="ts", by=("sym",))


def test_range_join_wide_interval_raises_descriptive(spark):
    import pytest

    trades = spark.createDataFrame([("a", 5, 1)], "sym string, ts long, qty long")
    open_ended = spark.createDataFrame(
        [("a", 0, 2**62, "sentinel")], "sym string, start long, end long, tag string"
    )
    with pytest.raises(Exception, match="max_buckets_per_interval"):
        range_join(
            trades, open_ended, point_col="ts", by=("sym",), bucket_width=7
        ).collect()
    # a legitimate wide interval under a raised cap still works
    got = range_join(
        trades, open_ended, point_col="ts", by=("sym",),
        bucket_width=2**40, max_buckets_per_interval=2**25,
    ).collect()
    assert len(got) == 1 and got[0]["tag"] == "sentinel"


def _global_frames(spark, n=400):
    # no-key frames big enough to span several quantile buckets
    quotes = spark.createDataFrame(
        [(i * 10, float(i)) for i in range(n)], "ts long, px double"
    )
    trades = spark.createDataFrame(
        [(i * 7 + 3, i) for i in range(n)], "ts long, qty long"
    )
    return trades, quotes


def test_asof_global_bucketed_matches_duckdb(spark):
    """by=() bucket-and-stitch vs DuckDB global ASOF, both directions,
    plus tolerance — matches must cross bucket boundaries correctly."""
    trades, quotes = _global_frames(spark)
    tp = trades.toPandas()
    qp = quotes.toPandas()
    con = duckdb.connect()
    con.register("t", tp)
    con.register("q", qp)
    for op, direction in ((">=", "backward"), ("<=", "forward")):
        got = {
            (r["ts"], r["qty"]): (r["px"], r["ts_r"])
            for r in asof_join(
                trades, quotes, on="ts", direction=direction, num_buckets=8
            ).collect()
        }
        want = {
            (ts, qty): (px, qts)
            for ts, qty, px, qts in con.execute(
                f"""SELECT t.ts, t.qty, q.px, q.ts
                    FROM t ASOF LEFT JOIN q ON t.ts {op} q.ts"""
            ).fetchall()
        }
        assert got == want, direction
    # tolerance on the bucketed path
    tol = {
        r["qty"]: r["ts_r"]
        for r in asof_join(trades, quotes, on="ts", tolerance=2, num_buckets=8).collect()
    }
    want_tol = {
        qty: (qts if qts is not None and ts - qts <= 2 else None)
        for (ts, qty), (px, qts) in {
            (ts, qty): (px, qts)
            for ts, qty, px, qts in con.execute(
                "SELECT t.ts, t.qty, q.px, q.ts FROM t ASOF LEFT JOIN q ON t.ts >= q.ts"
            ).fetchall()
        }.items()
    }
    assert tol == want_tol


def test_asof_global_bucketed_plan_parallel(spark):
    """The no-key path must NOT collapse to one global window task: the
    main carry partitions on the synthetic bucket (>1 partition), and
    the only single-partition window runs on the bucket-count-sized
    seed spine."""
    trades, quotes = _global_frames(spark)
    out = asof_join(trades, quotes, on="ts", num_buckets=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bucket" in plan
    assert out.count() == trades.count()


def test_asof_nearest_matches_pandas_merge_asof(spark):
    """direction='nearest' vs pandas merge_asof(direction='nearest'),
    keyed and global, incl. tolerance — and only one hash exchange in
    the keyed plan (the second direction adds a sort, not a shuffle)."""
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="ts", by=("sym",), direction="nearest")
    got = {(r["sym"], r["ts"]): (r["px"], r["ts_r"]) for r in out.collect()}
    tp = pd.DataFrame(TRADES, columns=["sym", "ts", "qty"]).sort_values("ts")
    qp = pd.DataFrame(QUOTES, columns=["sym", "ts", "px"]).sort_values("ts")
    ref = pd.merge_asof(
        tp, qp, on="ts", by="sym", direction="nearest", suffixes=("", "_q")
    )
    # pandas keeps the matched right ts only implicitly; recompute it
    want = {}
    for _, r in ref.iterrows():
        if pd.isna(r["px"]):
            want[(r["sym"], r["ts"])] = (None, None)
        else:
            qts = qp[(qp.sym == r["sym"]) & (qp.px == r["px"])]["ts"].iloc[0]
            want[(r["sym"], r["ts"])] = (r["px"], qts)
    assert got == want
    # equidistant tie: trade ts exactly between two quotes -> backward
    q2 = spark.createDataFrame([("a", 10, 1.0), ("a", 20, 2.0)], "sym string, ts long, px double")
    t2 = spark.createDataFrame([("a", 15, 1)], "sym string, ts long, qty long")
    [row] = asof_join(t2, q2, on="ts", by=("sym",), direction="nearest").collect()
    assert (row["px"], row["ts_r"]) == (1.0, 10)
    p2 = pd.merge_asof(
        pd.DataFrame([("a", 15, 1)], columns=["sym", "ts", "qty"]),
        pd.DataFrame([("a", 10, 1.0), ("a", 20, 2.0)], columns=["sym", "ts", "px"]),
        on="ts", by="sym", direction="nearest",
    )
    assert p2["px"].iloc[0] == 1.0  # pandas breaks the tie backward too
    # plan: still exactly one hash exchange (in the FINAL plan — the
    # executed AQE plan echoes the initial plan below it)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert final.count("Window") == 2  # both carries over the one exchange
    # tolerance trims far matches in both directions
    tol = {
        (r["sym"], r["ts"]): r["ts_r"]
        for r in asof_join(
            trades, quotes, on="ts", by=("sym",), direction="nearest", tolerance=5
        ).collect()
    }
    assert tol[("b", 100)] is None  # nearest quote (30) is 70 away
    assert tol[("a", 25)] == 20  # 5 away backward beats 10 forward


def test_asof_nearest_global_bucketed(spark):
    trades, quotes = _global_frames(spark)
    got = {
        r["qty"]: r["ts_r"]
        for r in asof_join(
            trades, quotes, on="ts", direction="nearest", num_buckets=8
        ).collect()
    }
    tp = trades.toPandas().sort_values("ts")
    qp = quotes.toPandas().sort_values("ts")
    ref = pd.merge_asof(tp, qp, on="ts", direction="nearest", suffixes=("", "_q"))
    want = {}
    for _, r in ref.iterrows():
        qts = None if pd.isna(r["px"]) else int(r["px"] * 10)  # px = i, ts = i*10
        want[r["qty"]] = qts
    assert got == want


def test_asof_date_ordering_nearest_and_tolerance(spark):
    """DATE ordering columns (review finding): cast(date as double) is
    silently NULL, so distances must go through day numbers — nearest
    must pick the 1-day match over the 29-day one, and tolerance is in
    days."""
    q = spark.createDataFrame(
        [("2024-01-01", 1.0), ("2024-01-31", 2.0)], "d string, px double"
    ).select(F.col("d").cast("date").alias("d"), "px")
    t = spark.createDataFrame(
        [("2024-01-02", 1)], "d string, qty long"
    ).select(F.col("d").cast("date").alias("d"), "qty")
    [row] = asof_join(t, q, on="d", direction="nearest").collect()
    assert row["px"] == 1.0 and str(row["d_r"]) == "2024-01-01"
    [row] = asof_join(t, q, on="d", tolerance=2).collect()
    assert row["px"] == 1.0  # 1 day away, within 2-day tolerance
    [row] = asof_join(t, q, on="d", direction="forward", tolerance=2).collect()
    assert row["px"] is None  # forward match is 29 days away


def test_asof_null_ordering_values_never_match(spark):
    """NULL timestamps (review finding): a NULL-ts left row matches
    nothing in ANY direction (it used to inherit the smallest-ts right
    payload under forward's desc ordering), and a NULL-ts right row is
    never carried as a match."""
    quotes = spark.createDataFrame(
        [("a", None, 9.0), ("a", 10, 1.0), ("a", 20, 2.0)],
        "sym string, ts long, px double",
    )
    trades = spark.createDataFrame(
        [("a", None, 1), ("a", 5, 2), ("a", 15, 3)],
        "sym string, ts long, qty long",
    )
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["qty"]: (r["px"], r["ts_r"])
            for r in asof_join(
                trades, quotes, on="ts", by=("sym",), direction=direction
            ).collect()
        }
        assert got[1] == (None, None), direction  # NULL left: no match
        # the NULL-ts quote (px=9.0) is never matched by anyone
        assert all(v[0] != 9.0 for v in got.values()), direction
    # and the backward semantics on the real rows still hold
    got = {
        r["qty"]: r["px"]
        for r in asof_join(trades, quotes, on="ts", by=("sym",)).collect()
    }
    assert got == {1: None, 2: None, 3: 1.0}


def test_asof_global_null_ordering_values_never_match(spark):
    """ADVICE r7 (high): the GLOBAL (by=()) bucket-and-stitch path used
    to backfill NULL-ts left rows through the cross-bucket seed patch —
    a NULL __ts buckets to 0, gets no in-bucket carry, and the
    unguarded coalesce(__m, __seed) then attached a later bucket's
    seed right row under forward/nearest.  Pin all three directions on
    the multi-bucket path (num_buckets>1) AND the single-window
    fallback."""
    quotes = spark.createDataFrame(
        [(None, 9.0), (10, 1.0), (20, 2.0), (30, 3.0), (40, 4.0)],
        "ts long, px double",
    )
    trades = spark.createDataFrame(
        [(None, 1), (5, 2), (15, 3), (35, 4)],
        "ts long, qty long",
    )
    for nb in (1, 4):
        for direction in ("backward", "forward", "nearest"):
            got = {
                r["qty"]: (r["px"], r["ts_r"])
                for r in asof_join(
                    trades, quotes, on="ts", direction=direction,
                    num_buckets=nb,
                ).collect()
            }
            # NULL left row: unmatched, in every direction / bucketing
            assert got[1] == (None, None), (direction, nb)
            # the NULL-ts quote is never carried as a match
            assert all(v[0] != 9.0 for v in got.values()), (direction, nb)
        # non-NULL rows still match correctly on the same frames
        got = {
            r["qty"]: r["px"]
            for r in asof_join(
                trades, quotes, on="ts", direction="forward", num_buckets=nb
            ).collect()
        }
        assert got == {1: None, 2: 1.0, 3: 2.0, 4: 4.0}, nb


def test_range_join_reversed_interval_matches_nothing(spark):
    """end < start (review finding): matches nothing like SQL BETWEEN —
    must not fall into sequence()'s implicit descending step (which
    exploded to billions of buckets past the guard)."""
    pts = spark.createDataFrame([("a", 5, 1)], "sym string, ts long, qty long")
    iv = spark.createDataFrame(
        [("a", 2**40, 0, "rev"), ("a", 0, 10, "ok")],
        "sym string, start long, end long, tag string",
    )
    got = {
        r["tag"]
        for r in range_join(pts, iv, point_col="ts", by=("sym",), bucket_width=7).collect()
    }
    assert got == {"ok"}


@settings(max_examples=10, deadline=None)
@given(rights=_rights, lefts=_lefts)
def test_asof_nearest_property_matches_pandas(spark, rights, lefts):
    """Cross-engine property for direction='nearest': Spark == pandas
    merge_asof over random frames (unique right (key, ts); NULL right
    payloads included)."""
    rrows = [
        (k, ts, None if v is None else float(v))
        for (k, ts), v in rights.items()
    ]
    lrows = [(k, ts, i) for i, (k, ts) in enumerate(lefts)]
    quotes = spark.createDataFrame(
        rrows or [("zz", -1, 0.0)], "sym string, ts long, px double"
    )
    trades = spark.createDataFrame(lrows, "sym string, ts long, qty long")
    got = {
        (r["sym"], r["ts"], r["qty"]): r["ts_r"]
        for r in asof_join(
            trades, quotes, on="ts", by=("sym",), direction="nearest"
        ).collect()
    }
    qp = pd.DataFrame(
        rrows or [("zz", -1, 0.0)], columns=["sym", "ts", "px"]
    ).sort_values("ts").reset_index(drop=True)
    tp = pd.DataFrame(lrows, columns=["sym", "ts", "qty"]).sort_values(
        "ts"
    ).reset_index(drop=True)
    qp["qts"] = qp["ts"]
    ref = pd.merge_asof(
        tp, qp, on="ts", by="sym", direction="nearest", suffixes=("", "_q")
    )
    want = {
        (r["sym"], r["ts"], r["qty"]): (None if pd.isna(r["qts"]) else int(r["qts"]))
        for _, r in ref.iterrows()
    }
    assert got == want
