"""Time-bucket resample + gap fill (ops/timeseries.py) vs a Python
reference and the generated DuckDB twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.timeseries import (
    _CHUNK,
    gap_fill,
    resample,
    resample_duckdb_sql,
    resample_gap_fill,
    stride_us,
    time_bucket,
)

H = 3_600_000_000  # 1 h in micros


def test_stride_us_parses_and_rejects():
    assert stride_us("1h") == H
    assert stride_us("15m") == 900_000_000
    assert stride_us("7d") == 7 * 24 * H
    assert stride_us(42) == 42
    for bad in ("0h", "-1s", 0, -5, "3x"):
        with pytest.raises(ValueError):
            stride_us(bad)


def test_time_bucket_floor_including_pre_epoch(spark):
    df = spark.createDataFrame(
        [("1969-12-31 23:59:59.999999",), ("1970-01-01 00:00:00",),
         ("1970-01-01 00:59:59",), ("1970-01-01 01:00:00",)],
        "t string",
    ).select(F.col("t").cast("timestamp").alias("t"))
    got = [r[0] for r in df.select(time_bucket("t", "1h")).collect()]
    # pre-epoch floors DOWN (pmod, not %): -1us -> -1h, not 0
    assert got == [-H, 0, 0, H]


def _events(spark):
    # 2 users; user 1 has an hour-wide hole (10:xx missing), user 2 a
    # single event — exercises spine bounds, zero fill, and ffill
    rows = [
        (1, "2024-01-01 09:10:00", 10.0),
        (1, "2024-01-01 09:50:00", 2.0),
        (1, "2024-01-01 11:05:00", 7.0),
        (2, "2024-01-01 00:30:00", 1.5),
    ]
    return spark.createDataFrame(
        rows, "uid long, t string, v double"
    ).select("uid", F.col("t").cast("timestamp").alias("t"), "v")


def test_resample_counts_and_null_drop(spark):
    ev = _events(spark).unionByName(
        spark.sql("SELECT CAST(NULL AS LONG) uid, CAST('2024-01-01' AS TIMESTAMP) t, 1.0 v")
    ).unionByName(
        spark.sql("SELECT CAST(9 AS LONG) uid, CAST(NULL AS TIMESTAMP) t, 1.0 v")
    )
    agg = resample(ev, "t", "1h", ["uid"], [F.count(F.lit(1)).alias("n")])
    got = {(r["uid"], r["bucket_us"]): r["n"] for r in agg.collect()}
    base = 1704067200 * 1_000_000  # 2024-01-01 00:00 UTC
    assert got == {
        (1, base + 9 * H): 2,
        (1, base + 11 * H): 1,
        (2, base): 1,
    }  # NULL uid and NULL ts rows dropped


def test_gap_fill_modes_spine_and_leading_nulls(spark):
    agg = resample(
        _events(spark), "t", "1h", ["uid"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    )
    dense = gap_fill(agg, "1h", ["uid"], fill={"n": "zero", "s": "ffill"})
    base = 1704067200 * 1_000_000
    got = {(r["uid"], r["bucket_us"]): (r["n"], r["s"]) for r in dense.collect()}
    # user 1: spine 09..11 inclusive, hole at 10 zero-filled / carried
    assert got[(1, base + 9 * H)] == (2, 12.0)
    assert got[(1, base + 10 * H)] == (0, 12.0)   # ffill carries 12.0
    assert got[(1, base + 11 * H)] == (1, 7.0)
    # user 2: single-bucket spine
    assert got[(2, base)] == (1, 1.5)
    assert len(got) == 4


def test_gap_fill_none_mode_leaves_nulls(spark):
    agg = resample(
        _events(spark), "t", "1h", ["uid"], [F.sum("v").alias("s")]
    )
    dense = gap_fill(agg, "1h", ["uid"])  # default: no fill
    base = 1704067200 * 1_000_000
    got = {(r["uid"], r["bucket_us"]): r["s"] for r in dense.collect()}
    assert got[(1, base + 10 * H)] is None


def test_gap_fill_rejects_unknown_columns_and_modes(spark):
    agg = resample(_events(spark), "t", "1h", ["uid"])
    with pytest.raises(ValueError, match="unknown value columns"):
        gap_fill(agg, "1h", ["uid"], fill={"nope": "zero"})
    with pytest.raises(ValueError, match="fill modes"):
        gap_fill(agg, "1h", ["uid"], fill={"n": "nearest"})


def test_spine_two_level_explode_wide_span(spark):
    # one key spanning > _CHUNK buckets: the two-level explode must
    # produce the exact inclusive sequence with no dupes or holes
    n_buckets = _CHUNK * 2 + 7
    df = spark.createDataFrame(
        [(1, 0), (1, (n_buckets - 1) * 60_000_000)], "uid long, us long"
    ).select("uid", F.timestamp_micros("us").alias("t"))
    dense = resample_gap_fill(df, "t", "1m", ["uid"], fill={"n": "zero"})
    stats = dense.agg(
        F.count(F.lit(1)), F.countDistinct("bucket_us"),
        F.min("bucket_us"), F.max("bucket_us"), F.sum("n")
    ).collect()[0]
    assert list(stats) == [
        n_buckets, n_buckets, 0, (n_buckets - 1) * 60_000_000, 2
    ]


def test_global_no_key_series(spark, tmp_path):
    dense = resample_gap_fill(
        _events(spark), "t", "1h", None,
        aggs=[F.count(F.lit(1)).alias("n")], fill={"n": "zero"},
    )
    base = 1704067200 * 1_000_000
    got = {r["bucket_us"]: r["n"] for r in dense.collect()}
    # global span 00..11 inclusive = 12 buckets
    assert len(got) == 12
    assert got[base] == 1 and got[base + 5 * H] == 0 and got[base + 9 * H] == 2
    # the generated oracle supports the keyless form too
    pq = str(tmp_path / "evg.parquet")
    _events(spark).write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW evg AS SELECT * FROM '{pq}/*.parquet'")
    sql = resample_duckdb_sql("evg", "t", "1h", [], {"n": "COUNT(*)"}, fill={"n": "zero"})
    oracle = {r[0]: r[1] for r in con.execute(sql).fetchall()}
    assert {k: int(v) for k, v in oracle.items()} == got


def test_duckdb_twin_engine_exact(spark, tmp_path):
    ev = _events(spark)
    pq = str(tmp_path / "ev.parquet")
    ev.write.parquet(pq)
    dense = resample_gap_fill(
        ev, "t", "1h", ["uid"],
        aggs=[
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,4)")).alias("s"),
        ],
        fill={"n": "zero", "s": "ffill"},
    ).select(
        "uid", "bucket_us", F.col("n").cast("long").alias("n"),
        F.col("s").cast("decimal(18,4)").cast("string").alias("s"),
    )
    got = sorted(tuple(str(x) for x in r) for r in dense.collect())
    sql = resample_duckdb_sql(
        "ev", "t", "1h", ["uid"],
        {"n": "COUNT(*)", "s": "SUM(CAST(v AS DECIMAL(18,4)))"},
        fill={"n": "zero", "s": "ffill"},
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ev AS SELECT * FROM '{pq}/*.parquet'")
    oracle = sorted(
        tuple(str(x) for x in r)
        for r in con.execute(
            "SELECT uid, bucket_us, CAST(n AS BIGINT), "
            f"CAST(CAST(s AS DECIMAL(18,4)) AS VARCHAR) FROM ({sql})"
        ).fetchall()
    )
    assert got == oracle


def test_plan_shape(spark):
    # resample = ONE combinable aggregation (partial before exchange);
    # gap_fill's window partitions by key (no global sort / single-
    # partition window)
    ev = _events(spark)
    agg_plan = (
        resample(ev, "t", "1h", ["uid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in agg_plan
    dense = resample_gap_fill(ev, "t", "1h", ["uid"], fill={"n": "ffill"})
    plan = dense._jdf.queryExecution().executedPlan().toString()
    assert "RangePartitioning" not in plan  # never a global sort
    assert "Window" in plan
    # the fill window carries an explicit partition spec over the key
    # (a keyless window would move everything to one task)
    opt = dense._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(uid" in opt.replace(" ", "").lower()


def test_gap_fill_materializes_agg_once(spark, tmp_path):
    # the aggregated frame feeds BOTH the spine bounds and the join
    # probe; the lazy localCheckpoint barrier means the raw source is
    # scanned once, not inlined into both branches
    pq = str(tmp_path / "ev2.parquet")
    _events(spark).write.parquet(pq)
    ev = spark.read.parquet(pq)
    dense = resample_gap_fill(ev, "t", "1h", ["uid"], fill={"n": "zero"})
    plan = dense._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0  # behind the barrier
    # computed once, read twice: the sparse fill window + the
    # size-guard total (the round-15 sparse-window shape removed the
    # former third branch — the dense join probe)
    assert plan.count("Scan ExistingRDD") == 2
    # with the guard off, only the window branch remains
    dense_ng = resample_gap_fill(
        ev, "t", "1h", ["uid"], fill={"n": "zero"}, max_spine_rows=None
    )
    plan_ng = dense_ng._jdf.queryExecution().executedPlan().toString()
    assert plan_ng.count("Scan ExistingRDD") == 1
    # opting out of the barrier inlines the lineage into every branch:
    # two raw scans with the guard, one without
    inlined = resample_gap_fill(
        ev, "t", "1h", ["uid"], fill={"n": "zero"}, materialize=False
    )
    plan2 = inlined._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan parquet") == 2
    inlined_ng = resample_gap_fill(
        ev, "t", "1h", ["uid"], fill={"n": "zero"}, materialize=False,
        max_spine_rows=None,
    )
    plan2_ng = inlined_ng._jdf.queryExecution().executedPlan().toString()
    assert plan2_ng.count("Scan parquet") == 1


def test_gap_fill_raises_on_misaligned_stride(spark):
    # buckets built at 1h, gap-filled at 7m: the spine would miss
    # every aggregated bucket — must fail loudly, not emit NULL rows
    agg = resample(_events(spark), "t", "1h", ["uid"])
    with pytest.raises(Exception, match="aligned to the stride"):
        gap_fill(agg, "7m", ["uid"]).collect()
    # the matching stride still works
    assert gap_fill(agg, "1h", ["uid"]).count() > 0


def test_gap_fill_catches_interior_misalignment(spark):
    """Review finding: the min/max-only guard let a coarser stride
    (1h buckets gap-filled at 2h) pass while interior odd-hour rows
    silently vanished; the guard now checks max(pmod) over ALL
    buckets."""
    rows = [(1, "2024-01-01 00:10:00", 1.0), (1, "2024-01-01 01:10:00", 2.0),
            (1, "2024-01-01 02:10:00", 3.0)]
    ev = spark.createDataFrame(rows, "uid long, t string, v double").select(
        "uid", F.col("t").cast("timestamp").alias("t"), "v"
    )
    agg = resample(ev, "t", "1h", ["uid"])
    with pytest.raises(Exception, match="aligned to the stride"):
        gap_fill(agg, "2h", ["uid"]).collect()
    # densifying FINER than the build stride stays allowed (all
    # buckets land on the finer grid)
    assert gap_fill(agg, "30m", ["uid"]).count() == 5


def test_resample_duckdb_sql_validates_fill(spark):
    with pytest.raises(ValueError, match="fill modes"):
        resample_duckdb_sql("t", "ts", "1h", ["k"], {"n": "COUNT(*)"}, fill={"n": "zeros"})
    with pytest.raises(ValueError, match="unknown value columns"):
        resample_duckdb_sql("t", "ts", "1h", ["k"], {"n": "COUNT(*)"}, fill={"q": "zero"})


def test_gap_fill_interp_mode(spark, tmp_path):
    """Linear interpolation: interior gaps fill on the straight line
    between the enclosing observations (exact at integer points);
    leading/trailing gaps stay NULL; the generated DuckDB twin
    matches bit-for-bit (same IEEE expression tree)."""
    rows = [
        (1, "2024-01-01 01:10:00", 10.0),   # bucket 01
        (1, "2024-01-01 04:10:00", 4.0),    # bucket 04: gap 02, 03
        (1, "2024-01-01 05:10:00", 7.0),    # bucket 05
        (2, "2024-01-01 00:10:00", 1.0),
    ]
    ev = spark.createDataFrame(rows, "uid long, t string, v double").select(
        "uid", F.col("t").cast("timestamp").alias("t"), "v"
    )
    # spine for user 1: 01..05; add a leading gap by unioning an early
    # count-only event (n observed, v NULL at bucket 00)
    agg = resample(
        ev, "t", "1h", ["uid"], [F.sum("v").alias("v")]
    ).unionByName(
        spark.createDataFrame(
            [(1, 0 * H + 1704067200 * 1_000_000, None)],
            "uid long, bucket_us long, v double",
        )
    )
    dense = gap_fill(agg, "1h", ["uid"], fill={"v": "interp"})
    base = 1704067200 * 1_000_000
    got = {(r["uid"], r["bucket_us"]): r["v"] for r in dense.collect()}
    assert got[(1, base + 1 * H)] == 10.0
    assert got[(1, base + 2 * H)] == 8.0    # 10 -> 4 over 3 steps
    assert got[(1, base + 3 * H)] == 6.0
    assert got[(1, base + 4 * H)] == 4.0
    assert got[(1, base + 5 * H)] == 7.0
    assert got[(1, base)] is None           # leading gap: nothing to anchor
    assert got[(2, base)] == 1.0
    # DuckDB twin bit-exact on the same parquet
    pq = str(tmp_path / "evi.parquet")
    ev.write.parquet(pq)
    sql = resample_duckdb_sql(
        "evi", "t", "1h", ["uid"], {"v": "SUM(v)"}, fill={"v": "interp"}
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW evi AS SELECT * FROM '{pq}/*.parquet'")
    oracle = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
    spark_side = {
        (r["uid"], r["bucket_us"]): r["v"]
        for r in gap_fill(
            resample(ev, "t", "1h", ["uid"], [F.sum("v").alias("v")]),
            "1h", ["uid"], fill={"v": "interp"},
        ).collect()
    }
    assert spark_side == oracle


def test_spine_size_guard_raises_with_estimate(spark):
    """VERDICT r11 #4: a 3-year key at 1 s stride must raise BEFORE
    exploding anything, with the exact estimated row count in the
    message; the raise fires at the bounds stage, so it costs nothing
    on the happy path."""
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import gap_fill

    three_years_us = 3 * 365 * 86_400 * 1_000_000
    agg = spark.createDataFrame(
        [(1, 0, 5), (1, three_years_us, 7)],
        "user_id long, bucket_us long, n long",
    )
    want_rows = 3 * 365 * 86_400 + 1  # 94,608,001
    with _pytest.raises(Exception, match=f"estimated dense spine is {want_rows} rows"):
        gap_fill(agg, "1s", ["user_id"], fill={"n": "zero"}).collect()


def test_spine_size_guard_cap_and_override(spark):
    """The cap sums across keys (two 10-bucket keys = 21 estimated
    rows fail a cap of 20), a cap at exactly the estimate passes, and
    max_spine_rows=None disables the guard entirely."""
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import gap_fill

    s = 1_000_000  # 1 s
    agg = spark.createDataFrame(
        [(1, 0, 1), (1, 10 * s, 1), (2, 0, 1), (2, 9 * s, 1)],
        "user_id long, bucket_us long, n long",
    )  # key 1 spans 11 buckets, key 2 spans 10 -> 21 total
    with _pytest.raises(Exception, match="estimated dense spine is 21 rows"):
        gap_fill(
            agg, "1s", ["user_id"], fill={"n": "zero"}, max_spine_rows=20
        ).collect()
    ok = gap_fill(
        agg, "1s", ["user_id"], fill={"n": "zero"}, max_spine_rows=21
    )
    assert ok.count() == 21
    off = gap_fill(
        agg, "1s", ["user_id"], fill={"n": "zero"}, max_spine_rows=None
    )
    assert off.count() == 21


# -- rolling / ewma: moving aggregates over the dense series (round 12) -------


def test_rolling_matches_pandas_reference(spark):
    """Per-key trailing sum/avg/min/max/count over the gap-filled
    series vs a pandas rolling reference (min_periods=1 == the SQL
    frame over existing rows)."""
    import pandas as pd

    from knovexlite_spark.ops.timeseries import gap_fill, rolling

    s = 3_600_000_000  # 1h
    rows = [
        (u, b * s, float(u * 10 + b) if b % 3 else None)
        for u in (1, 2)
        for b in range(12)
    ]
    agg = spark.createDataFrame(rows, "uid long, bucket_us long, x double")
    dense = gap_fill(agg, "1h", ["uid"], fill={"x": None})
    out = rolling(dense, ["uid"], {"x": ["sum", "avg", "min", "max", "count"]}, 4)
    got = out.orderBy("uid", "bucket_us").toPandas()
    for u in (1, 2):
        ser = pd.Series([r[2] for r in rows if r[0] == u])
        sub = got[got.uid == u].reset_index(drop=True)
        for agg_name, ref in (
            ("sum", ser.rolling(4, min_periods=1).sum()),
            ("avg", ser.rolling(4, min_periods=1).mean()),
            ("min", ser.rolling(4, min_periods=1).min()),
            ("max", ser.rolling(4, min_periods=1).max()),
            ("count", ser.rolling(4, min_periods=1).count()),
        ):
            col = sub[f"x_{agg_name}4"].astype(float)
            for i in range(12):
                r = ref.iloc[i]
                g = col.iloc[i]
                if pd.isna(r):
                    assert pd.isna(g) or (agg_name == "count" and g == 0.0)
                else:
                    assert abs(g - r) < 1e-9, (u, agg_name, i, g, r)


def test_rolling_validates_inputs(spark):
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import rolling

    df = spark.createDataFrame([(1, 0, 1)], "uid long, bucket_us long, n long")
    with _pytest.raises(ValueError, match="window must be"):
        rolling(df, ["uid"], {"n": ["sum"]}, 0)
    with _pytest.raises(ValueError, match="unknown columns"):
        rolling(df, ["uid"], {"zz": ["sum"]}, 3)
    with _pytest.raises(ValueError, match="unknown rolling aggs"):
        rolling(df, ["uid"], {"n": ["median"]}, 3)


def test_rolling_reuses_the_fill_exchange(spark):
    """rolling after gap_fill adds NO new shuffle: its window
    partitions/orders exactly like the fill windows, so the plan has
    the same Exchange count with and without the rolling stage."""
    from knovexlite_spark.ops.timeseries import gap_fill, rolling

    s = 3_600_000_000
    agg = spark.createDataFrame(
        [(1, 0, 1), (1, 5 * s, 2), (2, 0, 3)],
        "uid long, bucket_us long, n long",
    )
    # ffill creates the per-key fill window rolling chains onto
    dense = gap_fill(agg, "1h", ["uid"], fill={"n": "ffill"})
    base_plan = dense._jdf.queryExecution().executedPlan().toString()
    rolled = rolling(dense, ["uid"], {"n": ["sum", "max"]}, 6)
    roll_plan = rolled._jdf.queryExecution().executedPlan().toString()
    assert base_plan.count("Exchange") == roll_plan.count("Exchange")
    assert roll_plan.count("Window") >= base_plan.count("Window")


def test_ewma_bit_exact_vs_duckdb_and_reference(spark, tmp_path):
    """The EWMA float contract (the 'interp' convention): identical
    IEEE expression tree in both engines -> BIT-exact equality; and
    the weights really are the span-windowed (1-a)^j normalization
    (checked against an explicit python reference, NULLs skipped)."""
    import duckdb

    from knovexlite_spark.ops.timeseries import ewma, rolling, rolling_duckdb_sql

    s = 3_600_000_000
    rows = []
    for u in (1, 2):
        for b in range(10):
            x = None if (u, b) in ((1, 3), (2, 0)) else float(u * 100 + b * 7)
            rows.append((u, b * s, x, u + b))
    agg = spark.createDataFrame(rows, "uid long, bucket_us long, x double, n long")
    pq = str(tmp_path / "dense.parquet")
    agg.write.parquet(pq)
    dense = spark.read.parquet(pq)
    out = rolling(dense, ["uid"], {"n": ["sum", "min"]}, 3)
    out = ewma(out, ["uid"], "x", alpha=0.25, window=4)
    got = sorted(
        map(tuple, out.select("uid", "bucket_us", "n_sum3", "n_min3", "x_ewma4").collect())
    )
    sql = rolling_duckdb_sql(
        f"SELECT * FROM read_parquet('{pq}/*.parquet')",
        ["uid"],
        {"n": ["sum", "min"]},
        3,
        ewma_col="x",
        ewma_alpha=0.25,
        ewma_window=4,
    )
    want = sorted(
        (r[0], r[1], int(r[4]), int(r[5]), r[6])
        for r in duckdb.connect().execute(
            f"SELECT uid, bucket_us, x, n, n_sum3, n_min3, x_ewma4 FROM ({sql})"
        ).fetchall()
    )
    assert got == want  # bit-exact doubles included
    # python reference for one key
    xs = [r[2] for r in rows if r[0] == 1]
    coefs = [(0.75) ** j for j in range(4)]
    for t in range(10):
        num = den = 0.0
        for j, c in enumerate(coefs):
            if t - j >= 0 and xs[t - j] is not None:
                num += c * xs[t - j]
                den += c
        ref = num / den if den > 0 else None
        g = next(v for u, b, _, _, v in got if u == 1 and b == t * s)
        if ref is None:
            assert g is None
        else:
            assert abs(g - ref) < 1e-12


def test_ewma_validates_alpha(spark):
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import ewma

    df = spark.createDataFrame([(1, 0, 1.0)], "uid long, bucket_us long, x double")
    for bad in (0.0, -0.1, 1.5):
        with _pytest.raises(ValueError, match="alpha"):
            ewma(df, ["uid"], "x", alpha=bad, window=3)


def test_rolling_and_ewma_reject_name_collisions(spark):
    """Duplicate output names would break downstream column
    resolution silently — loud instead (round-12 self-review)."""
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import ewma, rolling

    df = spark.createDataFrame(
        [(1, 0, 1, 5, 2.0, 3.0)],
        "uid long, bucket_us long, n long, n_sum3 long, x double, "
        "x_ewma2 double",
    )
    with _pytest.raises(ValueError, match="already exists"):
        rolling(df, ["uid"], {"n": ["sum"]}, 3)
    with _pytest.raises(ValueError, match="already exists"):
        ewma(df, ["uid"], "x", alpha=0.5, window=2)


def test_rolling_range_frame_equals_dense_rows_frame(spark):
    """The sparse fast path: a range frame over the RAW resampled
    frame computes the same time-windowed aggregates as a rows frame
    over the unfilled dense grid — dense NULL rows position the frame
    but contribute no values — so sparse series skip gap_fill
    entirely when fills should not participate."""
    from knovexlite_spark.ops.timeseries import gap_fill, resample, rolling

    ev = _events(spark)
    agg = resample(
        ev, "t", "1h", ["uid"],
        [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
    ).localCheckpoint()
    specs = {"n": ["sum", "avg", "min", "max", "count"],
             "s": ["sum", "max"]}
    sparse = rolling(agg, ["uid"], specs, 3, frame="range", stride="1h")
    dense = rolling(
        gap_fill(agg, "1h", ["uid"], materialize=False),  # no fills
        ["uid"],
        specs,
        3,
    )
    cols = ["uid", "bucket_us"] + [
        f"{c}_{a}3" for c, aggs in specs.items() for a in aggs
    ]
    got_sparse = {
        (r["uid"], r["bucket_us"]): tuple(r[c] for c in cols[2:])
        for r in sparse.collect()
    }
    got_dense = {
        (r["uid"], r["bucket_us"]): tuple(r[c] for c in cols[2:])
        for r in dense.collect()
    }
    # every OBSERVED bucket agrees agg-for-agg
    for k, v in got_sparse.items():
        assert got_dense[k] == v, (k, v, got_dense[k])


def test_rolling_range_frame_duckdb_twin_and_validation(spark, tmp_path):
    """The range-frame twin replays engine-exactly (integer range
    offsets over bucket micros), and the frame/stride inputs are
    validated loudly in BOTH the operator and the generator."""
    import duckdb
    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import rolling, rolling_duckdb_sql

    s = 3_600_000_000
    # sparse, irregular buckets
    rows = [(1, 0, 2), (1, 2 * s, 5), (1, 3 * s, 1), (2, 5 * s, 7)]
    agg = spark.createDataFrame(rows, "uid long, bucket_us long, n long")
    pq = str(tmp_path / "sparse.parquet")
    agg.write.parquet(pq)
    sp = spark.read.parquet(pq)
    out = rolling(sp, ["uid"], {"n": ["sum", "max"]}, 3, frame="range", stride="1h")
    got = sorted(
        (r["uid"], r["bucket_us"], r["n_sum3"], r["n_max3"])
        for r in out.collect()
    )
    # hand-checked: bucket 2h sees {2h}, {0h out of range? span=2h -> 0h included}
    assert got == [
        (1, 0, 2, 2),
        (1, 2 * s, 7, 5),   # 0h and 2h within 2h span
        (1, 3 * s, 6, 5),   # 2h and 3h (0h fell out)
        (2, 5 * s, 7, 7),
    ]
    sql = rolling_duckdb_sql(
        f"SELECT * FROM read_parquet('{pq}/*.parquet')",
        ["uid"],
        {"n": ["sum", "max"]},
        3,
        frame="range",
        stride="1h",
    )
    want = sorted(
        (r[0], r[1], int(r[3]), int(r[4]))
        for r in duckdb.connect().execute(
            f"SELECT uid, bucket_us, n, n_sum3, n_max3 FROM ({sql})"
        ).fetchall()
    )
    assert got == want
    with _pytest.raises(ValueError, match="requires stride"):
        rolling(sp, ["uid"], {"n": ["sum"]}, 3, frame="range")
    with _pytest.raises(ValueError, match="frame must be"):
        rolling(sp, ["uid"], {"n": ["sum"]}, 3, frame="groups")
    with _pytest.raises(ValueError, match="requires stride"):
        rolling_duckdb_sql("t", ["uid"], {"n": ["sum"]}, 3, frame="range")


def test_gap_fill_bfill_mode_and_twin(spark, tmp_path):
    """'bfill' (NOCB) completes the fill set: absent buckets carry the
    NEXT observation backward; trailing buckets after a key's last
    observation stay NULL.  Engine-exact vs the generated twin
    (FIRST_VALUE ... IGNORE NULLS over the following frame)."""
    ev = _events(spark)
    dense = resample_gap_fill(
        ev, "t", "1h", ["uid"],
        aggs=[F.sum(F.col("v").cast("decimal(18,4)")).alias("s")],
        fill={"s": "bfill"},
    )
    base = 1704067200 * 1_000_000
    got = {(r["uid"], r["bucket_us"]): r["s"] for r in dense.collect()}
    # user 1: hole at 10:00 carries the NEXT observation (11:00's 7.0)
    assert float(got[(1, base + 10 * H)]) == 7.0
    assert float(got[(1, base + 9 * H)]) == 12.0  # observed stays
    # twin replay
    import duckdb

    pq = str(tmp_path / "evb.parquet")
    ev.write.parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW evb AS SELECT * FROM '{pq}/*.parquet'")
    sql = resample_duckdb_sql(
        "evb", "t", "1h", ["uid"],
        {"s": "SUM(CAST(v AS DECIMAL(18,4)))"}, fill={"s": "bfill"},
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            f"SELECT uid, bucket_us, CAST(CAST(s AS DECIMAL(18,4)) AS VARCHAR) FROM ({sql})"
        ).fetchall()
    }
    got_str = {
        k: (None if v is None else str(v)) for k, v in got.items()
    }
    assert got_str == want
    # typo'd mode stays loud in both operator and generator
    import pytest as _pytest

    agg = resample(ev, "t", "1h", ["uid"])
    with _pytest.raises(ValueError, match="fill modes"):
        gap_fill(agg, "1h", ["uid"], fill={"n": "backfill"})
    with _pytest.raises(ValueError, match="fill modes"):
        resample_duckdb_sql("evb", "t", "1h", ["uid"], {"n": "COUNT(*)"},
                            fill={"n": "backfill"})


def test_generator_validation_raises():
    """The generated-oracle entry points validate their knobs loudly
    (a typo'd emit/frame would otherwise produce silently-wrong SQL)."""
    import pytest as _pytest

    from knovexlite_spark.ops.quantile import gk_by_key_tree_duckdb_sql
    from knovexlite_spark.ops.timeseries import resample_duckdb_sql

    with _pytest.raises(ValueError, match="emit must be"):
        resample_duckdb_sql("t", "ts", "1h", [], {"n": "COUNT(*)"},
                            emit="sparse")
    with _pytest.raises(ValueError, match="emit must be"):
        gk_by_key_tree_duckdb_sql("t", "k", "v", 4, 2, [0.5], emit="points")
    with _pytest.raises(ValueError, match="fan_in must be"):
        gk_by_key_tree_duckdb_sql("t", "k", "v", 4, 1, [0.5])


def test_rolling_and_ewma_expression_caps_raise_loudly(spark):
    """Round-12 verdict #3: ewma unrolls `window` lag expressions and
    rolling stacks one window column per (col, agg) — past the caps
    that is a Catalyst expression-tree/codegen bomb, so both raise
    LOUDLY with the estimate (the module's spine-guard convention)
    instead of wedging the planner."""
    import pytest

    from knovexlite_spark.ops.timeseries import ewma, rolling

    df = spark.createDataFrame(
        [(1, 0, 1.0), (1, 60_000_000, 2.0)],
        "user_id long, bucket_us long, v double",
    )
    with pytest.raises(ValueError, match="257 lag expressions"):
        ewma(df, ["user_id"], "v", alpha=0.3, window=257)
    # a mid-size window passes the guard (construction only — the
    # cap-limit expression itself costs ~15 s of planning)
    ewma(df, ["user_id"], "v", alpha=0.3, window=64)
    # build a specs dict whose agg total crosses 256: 52 cols x 5 aggs
    wide = df
    specs = {}
    from pyspark.sql import functions as F

    for i in range(52):
        wide = wide.withColumn(f"c{i}", F.col("v") + i)
        specs[f"c{i}"] = ["sum", "avg", "min", "max", "count"]
    with pytest.raises(ValueError, match="260 window columns"):
        rolling(wide, ["user_id"], specs, 4)
    # under the cap still works
    rolling(df, ["user_id"], {"v": ["sum", "avg"]}, 4)


def test_ewma_single_frame_matches_lag_form(spark):
    """Regression harness for future ewma reimplementations: pins the
    CURRENT unrolled-F.lag form against a verbatim copy of itself —
    same terms, same left-assoc order, same NULL handling at partition
    heads and for interior NULL values.  (A round-15 single sliding
    collect_list frame variant measured SLOWER and was reverted; any
    future alternative must match this reference bit-for-bit.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.timeseries import _ewma_weights, ewma

    rows = []
    for uid in (1, 2):
        for i in range(12):
            v = None if (uid + i) % 4 == 0 else float(uid * 100 + i)
            rows.append((uid, i * 60_000_000, v))
    df = spark.createDataFrame(
        rows, "user_id long, bucket_us long, v double"
    )
    alpha, window = 0.25, 8
    got = ewma(df, ["user_id"], "v", alpha=alpha, window=window)

    # the pre-round-15 unrolled-lag formulation, verbatim
    ws = _ewma_weights(alpha, window)
    w = Window.partitionBy("user_id").orderBy("bucket_us")
    num = None
    den = None
    for j, coef in enumerate(ws):
        xj = F.lag(F.col("v"), j).over(w) if j else F.col("v")
        term = F.when(
            xj.isNotNull(), F.lit(coef) * xj.cast("double")
        ).otherwise(F.lit(0.0))
        wt = F.when(xj.isNotNull(), F.lit(coef)).otherwise(F.lit(0.0))
        num = term if num is None else num + term
        den = wt if den is None else den + wt
    y = F.when(den > 0.0, num / den).otherwise(F.lit(None).cast("double"))
    ref = df.withColumn("v_ewma8", y)

    left = {
        (r["user_id"], r["bucket_us"]): r["v_ewma8"] for r in got.collect()
    }
    right = {
        (r["user_id"], r["bucket_us"]): r["v_ewma8"] for r in ref.collect()
    }
    assert left == right  # exact float equality, not approx


def test_rolling_ewma_fused_matches_composition(spark):
    """The round-15 fused Arrow kernel is BIT-identical to
    ewma(rolling(...)) — every float compared via its IEEE hex form
    (format %a), so -0.0 vs 0.0 and last-ulp drift both fail.  The
    fixture exercises: multiple keys, NULL heads (ffill-style leading
    NULLs), interior NULLs in long AND double columns, a series
    shorter than the window, a -0.0 value, and all five aggs."""
    import struct

    from knovexlite_spark.ops.timeseries import (
        ewma,
        rolling,
        rolling_ewma_fused,
    )

    rows = []
    for k in ("a", "b", "c"):
        for i in range(40 if k != "c" else 3):
            n = None if (k == "b" and i < 3) else (i * 7 + (3 if k == "a" else 11))
            sv = None if (i % 5 == 0) else float((-1) ** i * i) * 0.37
            if k == "a" and i == 8:
                sv = -0.0
            rows.append((k, i * 900_000_000, n, sv))
    df = spark.createDataFrame(
        rows, "user_id string, bucket_us long, n long, sv double"
    )
    specs = {"n": ["sum", "avg", "max", "min", "count"], "sv": ["sum", "avg"]}
    composed = ewma(
        rolling(df, ["user_id"], specs, 8), ["user_id"], "sv",
        alpha=0.25, window=8,
    )
    fused = rolling_ewma_fused(df, ["user_id"], specs, 8, "sv", 0.25, 8)
    assert composed.columns == fused.columns
    assert composed.schema == fused.schema

    def canon(frame):
        out = []
        for r in frame.select(*sorted(frame.columns)).collect():
            key = []
            for v in r:
                key.append(
                    struct.pack(">d", v).hex()
                    if isinstance(v, float)
                    else repr(v)
                )
            out.append("|".join(key))
        return sorted(out)

    assert canon(composed) == canon(fused)


def test_rolling_ewma_fused_guards(spark):
    """Loud NotImplementedError/ValueError guards: non-bigint/double
    value columns, NaN values, unknown aggs, duplicate output names."""
    import math

    import pytest as _pytest

    from knovexlite_spark.ops.timeseries import rolling_ewma_fused

    df = spark.createDataFrame(
        [(1, 0, 1, 1.0), (1, 60, 2, float("nan"))],
        "uid long, bucket_us long, n long, sv double",
    )
    with _pytest.raises(NotImplementedError, match="bigint/double"):
        rolling_ewma_fused(
            df.withColumn("f", df.n.cast("int")),
            ["uid"], {"f": ["sum"]}, 4, "sv", 0.5, 4,
        )
    with _pytest.raises(Exception, match="NaN"):
        rolling_ewma_fused(
            df, ["uid"], {"sv": ["min"]}, 4, "sv", 0.5, 4
        ).collect()
    with _pytest.raises(ValueError, match="unknown rolling aggs"):
        rolling_ewma_fused(df, ["uid"], {"n": ["median"]}, 4, "sv", 0.5, 4)
    with _pytest.raises(ValueError, match="already exists"):
        rolling_ewma_fused(
            df.withColumn("n_sum4", df.n), ["uid"], {"n": ["sum"]}, 4,
            "sv", 0.5, 4,
        )


def test_rolling_ewma_fused_partition_row_cap(spark):
    """Memory contract (round-16, ADVICE): a partition over
    max_partition_rows raises LOUDLY instead of materializing an
    unbounded Arrow table in the Python worker."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from knovexlite_spark.ops.timeseries import rolling_ewma_fused

    df = (
        spark.range(0, 500, 1, 1)
        .select(
            F.lit(1).cast("long").alias("uid"),
            (F.col("id") * 60).alias("bucket_us"),
            F.col("id").alias("n"),
            F.col("id").cast("double").alias("sv"),
        )
    )
    out = rolling_ewma_fused(
        df, ["uid"], {"n": ["sum"]}, 4, "sv", 0.5, 4,
        max_partition_rows=100,
    )
    with _pytest.raises(Exception, match="partition holds over 100 rows"):
        out.collect()
    # under the cap the same frame computes fine
    ok = rolling_ewma_fused(
        df, ["uid"], {"n": ["sum"]}, 4, "sv", 0.5, 4,
        max_partition_rows=10_000,
    )
    assert ok.count() == 500


def test_rolling_ewma_fused_keyed_partition_contract(spark):
    """assume_keyed_partitions=True verifies the layout at runtime:
    an input NOT hash-partitioned by exactly the keys at the session
    shuffle width raises loudly (a silent violation would compute
    wrong windows at key boundaries); a correctly repartitioned input
    passes the check and matches the repartitioning path exactly."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from knovexlite_spark.ops.timeseries import rolling_ewma_fused

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.range(0, 400, 1, 4).select(
        (F.col("id") % 37).alias("uid"),
        (F.col("id") * 60).alias("bucket_us"),
        F.col("id").alias("n"),
        F.col("id").cast("double").alias("sv"),
    )
    # NOT key-partitioned (round-robin input partitions): must raise
    bad = rolling_ewma_fused(
        df, ["uid"], {"n": ["sum"]}, 4, "sv", 0.5, 4,
        assume_keyed_partitions=True,
    )
    with _pytest.raises(Exception, match="NOT hash-partitioned"):
        bad.collect()
    # correctly hash-partitioned at the session width: passes, and the
    # values match the default (self-repartitioning) path row for row
    good = rolling_ewma_fused(
        df.repartition(n_part, "uid"), ["uid"], {"n": ["sum"]}, 4,
        "sv", 0.5, 4, assume_keyed_partitions=True,
    )
    base = rolling_ewma_fused(
        df, ["uid"], {"n": ["sum"]}, 4, "sv", 0.5, 4,
    )
    key = ["uid", "bucket_us"]
    assert sorted(map(tuple, good.collect())) == sorted(
        map(tuple, base.collect())
    )
    assert good.select(*key).distinct().count() == 400
