"""Sketch persistence (ops/persist.py): parquet round-trip exactness,
loud metadata validation, and the cross-run incremental merge
semantics for all three sketch families."""

import bisect

import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.persist import (
    SKETCH_VERSION,
    gk_union,
    sketch_load,
    sketch_save,
)


def _day(spark, seed, n=3000):
    import numpy as np

    rng = np.random.default_rng(seed)
    vals = [int(x) for x in rng.integers(0, 500, size=n)]
    items = [f"it_{int(x)}" for x in rng.zipf(1.7, size=n) % 40]
    keys = [f"k{int(x)}" for x in rng.integers(0, 900, size=n)]
    return spark.createDataFrame(
        list(zip(vals, items, keys)), "v long, item string, ck string"
    ).repartition(3)


def test_round_trip_is_exact_all_families(spark, tmp_path):
    from knovexlite_spark.ops.profile import profile_local
    from knovexlite_spark.ops.quantile import gk_summary
    from knovexlite_spark.ops.sketch import hll_registers, mg_summary

    df = _day(spark, 1)
    frames = {
        "gk": gk_summary(
            df, "v", k_build=16, k_compress=12,
            group_col=F.pmod(F.col("v"), F.lit(4)),
        ),
        "mg": mg_summary(
            df.select("item", F.pmod(F.length("item"), F.lit(3)).alias("g")),
            "item", m=8, group_col="g",
        ),
        "hll": hll_registers(df, "ck", p=8),
        "profile": profile_local(
            df, quantile_cols=["v"], item_cols=["item"],
            distinct_cols=["ck"], k=8, m=8, p=8,
        ),
    }
    params = {"gk": {"k": 12}, "mg": {"m": 8}, "hll": {"p": 8, "salt": "hll"},
              "profile": {"k": 8, "m": 8, "p": 8}}
    for fam, frame in frames.items():
        path = str(tmp_path / fam)
        sketch_save(frame, path, fam, params=params[fam])
        loaded, meta = sketch_load(spark, path, expect_family=fam)
        assert meta == {
            "family": fam, "version": SKETCH_VERSION, "params": params[fam]
        }
        assert loaded.columns == frame.columns
        got = sorted(map(tuple, loaded.collect()))
        want = sorted(map(tuple, frame.collect()))
        assert got == want and got


def test_load_validation_is_loud(spark, tmp_path):
    from knovexlite_spark.ops.sketch import hll_registers

    df = _day(spark, 2, n=500)
    regs = hll_registers(df, "ck", p=8)
    # plain parquet is not a sketch file
    plain = str(tmp_path / "plain")
    regs.write.parquet(plain)
    with pytest.raises(ValueError, match="not a sketch file"):
        sketch_load(spark, plain)
    # family mismatch
    hpath = str(tmp_path / "h")
    sketch_save(regs, hpath, "hll", params={"p": 8})
    with pytest.raises(ValueError, match="expected 'gk'"):
        sketch_load(spark, hpath, expect_family="gk")
    # mixed saves appended into one path
    mixed = str(tmp_path / "mixed")
    sketch_save(regs, mixed, "hll", params={"p": 8})
    sketch_save(regs, mixed, "hll", params={"p": 9}, mode="append")
    with pytest.raises(ValueError, match="mixes 2 distinct"):
        sketch_load(spark, mixed)
    # future version
    fut = str(tmp_path / "future")
    (
        regs.withColumn("__family", F.lit("hll"))
        .withColumn("__version", F.lit(SKETCH_VERSION + 1))
        .withColumn("__params", F.lit("{}"))
        .write.parquet(fut)
    )
    with pytest.raises(ValueError, match="newer sketch format"):
        sketch_load(spark, fut)
    # unknown family / metadata clash on save
    with pytest.raises(ValueError, match="unknown sketch family"):
        sketch_save(regs, str(tmp_path / "x"), "bloom")
    with pytest.raises(ValueError, match="already has metadata"):
        sketch_save(
            regs.withColumn("__family", F.lit("hll")),
            str(tmp_path / "y"),
            "hll",
        )


def test_hll_incremental_merge_equals_union_build(spark, tmp_path):
    """merge(load(day1), build(day2)) == build(day1 ∪ day2) EXACTLY —
    register max is associative, so incremental daily distinct counts
    are not an approximation of the rebuild; they ARE the rebuild."""
    from knovexlite_spark.ops.sketch import hll_merge, hll_registers

    d1, d2 = _day(spark, 3), _day(spark, 4)
    path = str(tmp_path / "day1")
    sketch_save(hll_registers(d1, "ck", p=8), path, "hll", params={"p": 8})
    loaded, meta = sketch_load(spark, path, expect_family="hll")
    assert meta["params"]["p"] == 8
    merged = hll_merge(loaded, hll_registers(d2, "ck", p=8))
    rebuilt = hll_registers(d1.unionByName(d2), "ck", p=8)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, rebuilt.collect())
    )


def test_mg_incremental_merge_keeps_brackets_vs_union(spark, tmp_path):
    """mg_merge(mg_union(load(day1), build(day2))) keeps the bracket/
    coverage contract against the EXACT day1 ∪ day2 counts."""
    from knovexlite_spark.ops.sketch import mg_merge, mg_summary, mg_union

    m = 8
    d1, d2 = _day(spark, 5), _day(spark, 6)

    def build(df):
        return mg_summary(
            df.select("item", F.pmod(F.length("item"), F.lit(3)).alias("g")),
            "item", m=m, group_col="g",
        )

    path = str(tmp_path / "day1")
    sketch_save(build(d1), path, "mg", params={"m": m})
    loaded, _ = sketch_load(spark, path, expect_family="mg")
    merged = mg_merge(mg_union(loaded, build(d2)), m=m).collect()
    exact = {
        r["item"]: r["c"]
        for r in d1.unionByName(d2)
        .groupBy("item")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    assert merged
    errs = {r["err"] for r in merged}
    assert len(errs) == 1
    err = errs.pop()
    assert err > 0  # trims actually fired (zipf items, m < vocab)
    kept = set()
    for r in merged:
        kept.add(r["item"])
        assert r["cnt"] <= exact[r["item"]] <= r["cnt"] + err, r
    for it, c in exact.items():
        if it not in kept:
            assert c <= err, (it, c, err)


def test_gk_incremental_merge_keeps_brackets_vs_union(spark, tmp_path):
    """gk_merge(gk_union(load(day1_summary), day2_summary)) keeps the
    exact-bracketing invariant against day1 ∪ day2 and answers within
    the widened (two-compress) budget."""
    from knovexlite_spark.ops.quantile import (
        gk_compress,
        gk_merge,
        gk_quantiles,
        gk_summary,
    )

    d1, d2 = _day(spark, 7), _day(spark, 8)

    def build(df):
        return gk_summary(
            df, "v", k_build=32, k_compress=24,
            group_col=F.pmod(F.col("v"), F.lit(4)),
        )

    path = str(tmp_path / "day1")
    sketch_save(build(d1), path, "gk", params={"k_compress": 24})
    loaded, _ = sketch_load(spark, path, expect_family="gk")
    pts = gk_union(loaded, build(d2))
    srcs = sorted(r["src"] for r in pts.select("src").distinct().collect())
    assert srcs == [0, 1]  # disjoint DENSE ids (nest-safe re-tag, r15)
    merged = gk_compress(gk_merge(pts, sources=srcs), k=24)
    vals = sorted(
        r["v"] for r in d1.unionByName(d2).select("v").collect()
    )
    n = len(vals)
    rows = merged.collect()
    assert max(r["rmax"] for r in rows) == n
    for r in rows:
        le = bisect.bisect_right(vals, r["v"])
        lt = bisect.bisect_left(vals, r["v"])
        assert r["rmin"] <= le and r["rmax"] >= lt + 1, tuple(r)
    # answers: each day's build pays ~n/32 + n/24, the cross-run merge
    # re-compress ~n/24 more — generous combined budget
    tol = 2 * (n // 32 + n // 24) + n // 24 + 8
    for frac, a in zip((0.5, 0.9), gk_quantiles(merged, [0.5, 0.9])):
        rank = bisect.bisect_right(vals, a)
        assert abs(rank - frac * n) <= tol, (frac, a, rank, tol)


def test_gk_union_rejects_unknown_shape(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError, match="do not match"):
        gk_union(df)
    with pytest.raises(ValueError, match="at least one"):
        gk_union()


def test_gk_union_by_key_incremental(spark, tmp_path):
    """Keyed gk_union (round-14 verdict #1): persisted per-key GK
    summaries merge cross-run — day1's per-key local build ++ day2's,
    per-key brackets hold against the exact per-key union and every
    key's max rmax equals its union count.  A keyed frame fed WITHOUT
    key_cols raises (never a silent key drop)."""
    import bisect

    from knovexlite_spark.ops.quantile import (
        gk_build_local_by_key,
        gk_compress_by_key,
        gk_merge_tree_by_key,
    )

    def day(lo, hi, parts):
        return (
            spark.range(lo, hi)
            .selectExpr(
                "CONCAT('k', CAST(id % 3 AS STRING)) AS g",
                "CAST((id * 13) % 211 AS BIGINT) AS v",
            )
            .repartition(parts)
        )

    d1, d2 = day(0, 3000, 2), day(3000, 6000, 3)
    b1 = gk_build_local_by_key(d1, "g", "v", k=12)
    path = str(tmp_path / "gk_keyed_day1")
    sketch_save(b1, path, "gk", params={"k": 12})
    loaded, _ = sketch_load(spark, path, expect_family="gk")
    with pytest.raises(ValueError, match="unexpected extra columns"):
        gk_union(loaded, gk_build_local_by_key(d2, "g", "v", k=12))
    pts = gk_union(
        loaded, gk_build_local_by_key(d2, "g", "v", k=12), key_cols="g"
    )
    srcs = sorted(r["src"] for r in pts.select("src").distinct().collect())
    assert srcs == list(range(5))  # 2 + 3 dense disjoint sources
    merged = gk_merge_tree_by_key(pts, "g", fan_in=4, sources=srcs)
    union = d1.unionByName(d2)
    by_key = {}
    for r in union.collect():
        by_key.setdefault(r["g"], []).append(r["v"])
    for vals in by_key.values():
        vals.sort()
    seen_max = {}
    for r in merged.collect():
        vals = by_key[r["g"]]
        assert r["rmin"] <= bisect.bisect_right(vals, r["v"]), tuple(r)
        assert r["rmax"] >= bisect.bisect_left(vals, r["v"]) + 1, tuple(r)
        seen_max[r["g"]] = max(seen_max.get(r["g"], 0), r["rmax"])
    assert {k: len(v) for k, v in by_key.items()} == seen_max
    # per-key COMPRESSED summaries also merge (one source per input
    # per the compressed-summary rule), keys intact
    c1 = gk_compress_by_key(
        gk_merge_tree_by_key(
            b1.localCheckpoint(),
            "g",
            sources=[
                r["src"]
                for r in b1.select("src").distinct().collect()
            ],
        ),
        "g",
        k=12,
    )
    pts2 = gk_union(
        c1, gk_build_local_by_key(d2, "g", "v", k=12), key_cols="g"
    )
    srcs2 = sorted(
        r["src"] for r in pts2.select("src").distinct().collect()
    )
    assert srcs2 == list(range(4))  # 1 compressed + 3 build sources
    m2 = gk_merge_tree_by_key(pts2, "g", fan_in=4, sources=srcs2)
    for r in m2.collect():
        vals = by_key[r["g"]]
        assert r["rmin"] <= bisect.bisect_right(vals, r["v"]), tuple(r)
        assert r["rmax"] >= bisect.bisect_left(vals, r["v"]) + 1, tuple(r)


def test_gk_union_nested_output_feeds_back(spark):
    """The round-14 advice collision pinned: a prior gk_union OUTPUT
    (which under the old scheme carried composite ids >= 2^32) feeds
    back into gk_union and sources stay disjoint."""
    from knovexlite_spark.ops.quantile import gk_build_local, gk_merge_tree

    def build(lo, hi, parts):
        return gk_build_local(
            spark.range(lo, hi)
            .selectExpr("CAST(id % 97 AS BIGINT) AS v")
            .repartition(parts),
            "v",
            k=12,
        )

    u12 = gk_union(build(0, 1500, 2), build(1500, 3200, 2))
    nested = gk_union(u12, build(3200, 5000, 3))
    srcs = sorted(
        r["src"] for r in nested.select("src").distinct().collect()
    )
    assert srcs == list(range(7))  # (2 + 2) + 3, no collision
    merged = gk_merge_tree(nested, fan_in=4, sources=srcs).collect()
    assert max(r["rmax"] for r in merged) == 5000
