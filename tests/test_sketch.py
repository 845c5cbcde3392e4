"""Count-min sketch (ops/sketch.py) vs exact counts."""

from pyspark.sql import functions as F

from knovexlite_spark.ops.sketch import (
    cms_error_bound,
    cms_estimate,
    count_min_sketch,
)

DEPTH, WIDTH = 5, 256


def _zipfish(spark):
    # heavy-hitter-shaped corpus: key k appears ~1000//(k+1) times
    rows = [(k,) for k in range(80) for _ in range(1000 // (k + 1))]
    return spark.createDataFrame(rows, "key long"), len(rows)


def test_cms_never_undercounts_and_bounds_overcount(spark):
    df, n = _zipfish(spark)
    sketch = count_min_sketch(df, "key", DEPTH, WIDTH)
    # sketch state is bounded by depth x width no matter the key space
    assert sketch.count() <= DEPTH * WIDTH
    # per-depth totals each equal N (every row increments once per depth)
    per_depth = {r["depth"]: r["s"] for r in sketch.groupBy("depth").agg(F.sum("cnt").alias("s")).collect()}
    assert set(per_depth) == set(range(DEPTH)) and all(v == n for v in per_depth.values())

    exact = df.groupBy("key").agg(F.count("*").cast("long").alias("exact"))
    est = cms_estimate(sketch, exact.select("key"), "key", DEPTH, WIDTH)
    joined = {r["key"]: (r["estimate"], r["exact"]) for r in est.join(exact, "key").collect()}
    bound = cms_error_bound(n, WIDTH)
    assert len(joined) == 80
    for k, (e, x) in joined.items():
        assert e >= x, (k, e, x)          # CMS never under-counts
        assert e - x <= bound, (k, e, x)  # within eps*N (fixed salt: deterministic)


def test_cms_unseen_keys_estimate_small_and_deterministic(spark):
    df, n = _zipfish(spark)
    sketch = count_min_sketch(df, "key", DEPTH, WIDTH)
    unseen = spark.createDataFrame([(10_000,), (10_001,)], "key long")
    got1 = {r["key"]: r["estimate"] for r in cms_estimate(sketch, unseen, "key", DEPTH, WIDTH).collect()}
    got2 = {r["key"]: r["estimate"] for r in cms_estimate(sketch, unseen, "key", DEPTH, WIDTH).collect()}
    assert got1 == got2  # salted-hash family: reproducible
    bound = cms_error_bound(n, WIDTH)
    assert all(0 <= v <= bound for v in got1.values())


def test_cms_build_plan_is_one_combinable_aggregation(spark):
    df, _ = _zipfish(spark)
    plan = (
        count_min_sketch(df, "key", DEPTH, WIDTH)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # partial agg before the single exchange: the shuffle is
    # sketch-sized (<= depth*width rows per task), not corpus-sized
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan
