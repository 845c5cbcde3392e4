"""From-scratch mergeable quantile summary (ops/quantile.py).

The contract under test, in order of load-bearingness:

1. EXACT BRACKETING — at every stage (build, flat n-way merge,
   hierarchical merge, compress) each point's [rmin, rmax] contains a
   valid rank of its value in the full multiset (rmin <= count(<= v)
   and rmax >= count(< v) + 1) — checked against a pure-Python exact
   reference on seeded random multisets WITH duplicates.
2. The rollup property: the last point's rmax == N, and merging
   summaries in any tree keeps (1).
3. Error bounds on real data at 3 scale factors.
4. Engine-for-engine DuckDB replay of build -> merge -> compress
   (the generated-oracle convention).
5. Determinism across partition layouts.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from knovexlite_spark.ops.quantile import (
    gk_build,
    gk_compress,
    gk_duckdb_sql,
    gk_merge,
    gk_quantiles,
    gk_summary,
)

from tests.conftest import SF_MEDIUM, SF_SMALL


def _exact_bracket_check(points, values):
    """points: list of (v, rmin, rmax); values: the full multiset.
    A bracket is valid iff it contains at least one rank the value's
    instances occupy: ranks of v are [count(< v) + 1, count(<= v)]."""
    arr = np.sort(np.asarray(values))
    for v, rmin, rmax in points:
        lt = int(np.searchsorted(arr, v, side="left"))
        le = int(np.searchsorted(arr, v, side="right"))
        assert le > lt, f"summary value {v} not present in the data"
        assert rmin <= le, f"v={v}: rmin {rmin} > count(<= v) {le}"
        assert rmax >= lt + 1, f"v={v}: rmax {rmax} < count(< v)+1 {lt + 1}"


def _multiset(seed: int, n: int) -> list[int]:
    rng = np.random.default_rng(seed)
    # heavy duplicates on purpose: values from a small-ish domain
    return [int(x) for x in rng.integers(0, max(4, n // 3), size=n)]


@pytest.mark.parametrize("seed,n,groups", [(1, 40, 1), (2, 500, 4), (3, 997, 7)])
def test_build_and_merge_keep_exact_brackets(spark, seed, n, groups):
    vals = _multiset(seed, n)
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(5)
    pts = gk_build(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(groups)))
    built = [(r["v"], r["rmin"], r["rmax"]) for r in pts.collect()]
    # build points are exact order statistics WITHIN their group; check
    # per-group exactness: rmin == rmax and the value really has that
    # rank in its group
    for g in range(groups):
        gvals = sorted(v for v in vals if v % groups == g)
        gp = [
            (r["v"], r["rmin"], r["rmax"])
            for r in pts.filter(F.col("src") == g).collect()
        ]
        for v, rmin, rmax in gp:
            assert rmin == rmax
            assert gvals[rmin - 1] == v  # the rmin-th smallest IS v
        assert max(r[2] for r in gp) == len(gvals)
    merged = gk_merge(pts)
    mpts = [(r["v"], r["rmin"], r["rmax"]) for r in merged.collect()]
    _exact_bracket_check(mpts, vals)
    assert max(r[2] for r in mpts) == len(vals)  # last point rmax == N
    comp = gk_compress(merged, k=6)
    cpts = [(r["v"], r["rmin"], r["rmax"]) for r in comp.collect()]
    _exact_bracket_check(cpts, vals)
    # compression only drops points, never rewrites them
    assert set(cpts) <= set(mpts)
    assert max(r[2] for r in cpts) == len(vals)


def test_small_group_summarizes_exactly(spark):
    vals = [5, 1, 9, 1, 7]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    pts = gk_build(df, "v", k=100)  # k >= n keeps every row
    got = sorted((r["v"], r["rmin"]) for r in pts.collect())
    assert got == [(1, 1), (1, 2), (5, 3), (7, 4), (9, 5)]


def test_hierarchical_merge_keeps_brackets_and_bounds(spark):
    vals = _multiset(11, 1200)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    pts = gk_build(df, "v", k=16, group_col=F.pmod(F.col("v"), F.lit(4)))
    # rollup tree: merge groups {0,1} and {2,3}, then merge the two
    # intermediate summaries — the daily-partition rollup shape
    lo = gk_merge(pts.filter(F.col("src") < 2), sources=[0, 1]).select(
        F.lit(0).cast("long").alias("src"), "v", "rmin", "rmax"
    )
    hi = gk_merge(pts.filter(F.col("src") >= 2), sources=[2, 3]).select(
        F.lit(1).cast("long").alias("src"), "v", "rmin", "rmax"
    )
    final = gk_merge(lo.unionByName(hi), sources=[0, 1])
    fpts = [(r["v"], r["rmin"], r["rmax"]) for r in final.collect()]
    _exact_bracket_check(fpts, vals)
    assert max(r[2] for r in fpts) == len(vals)
    # the flat n-way merge of the same build is at least as tight on
    # every shared value (hierarchy can only widen brackets)
    flat = {
        r["v"]: (r["rmin"], r["rmax"])
        for r in gk_merge(pts).collect()
    }
    hier = {}
    for v, rmin, rmax in fpts:
        cur = hier.get(v)
        hier[v] = (
            (rmin, rmax)
            if cur is None
            else (min(cur[0], rmin), max(cur[1], rmax))
        )
    for v, (frmin, frmax) in flat.items():
        hrmin, hrmax = hier[v]
        assert hrmin <= frmin and hrmax >= frmax


def test_query_error_bounds_at_three_sfs(spark):
    k_b, k_c = 64, 32
    for sf_dir in (SF_SMALL, SF_MEDIUM, "/root/testdata/sf0.1"):
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        cents = orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
        )
        summ = gk_summary(
            cents, "cents", k_build=k_b, k_compress=k_c, num_groups=8
        )
        n = cents.count()
        answers = gk_quantiles(summ, [0.5, 0.9, 0.99])
        # exact rank of each returned value, one pass
        checks = cents.agg(
            *[
                F.sum((F.col("cents") <= F.lit(a)).cast("long")).alias(f"r{i}")
                for i, a in enumerate(answers)
            ]
        ).first()
        # guarantee ~ N/k_build (merge bracket width) + N/k_compress
        # (band gap); allow both terms plus a small absolute floor
        tol = max(8, n // k_b + n // k_c)
        for i, frac in enumerate([0.5, 0.9, 0.99]):
            target = max(1, int(np.ceil(frac * n)))
            got_rank = checks[f"r{i}"]
            # the returned value occupies ranks up to count(<=v); its
            # bracket held a rank within tol of target
            assert abs(got_rank - target) <= tol, (
                f"{sf_dir} p{int(frac * 100)}: rank {got_rank} vs "
                f"target {target}, tol {tol} (n={n})"
            )


def test_determinism_across_partition_layouts(spark):
    vals = _multiset(7, 800)
    a = spark.createDataFrame([(v,) for v in vals], "v long").repartition(3)
    b = spark.createDataFrame([(v,) for v in vals], "v long").repartition(11)
    sa = sorted(map(tuple, gk_summary(a, "v", 16, 8, num_groups=4).collect()))
    sb = sorted(map(tuple, gk_summary(b, "v", 16, 8, num_groups=4).collect()))
    assert sa == sb


def test_duckdb_replay_is_engine_exact(spark):
    import duckdb

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    num_groups, k_b, k_c = 4, 16, 24
    summ = gk_summary(
        orders,
        "o_orderkey",
        k_build=k_b,
        k_compress=k_c,
        group_col=F.pmod(F.col("o_orderkey"), F.lit(num_groups)),
    )
    got = sorted(
        (r["idx"], r["v"], r["rmin"], r["rmax"]) for r in summ.collect()
    )
    sql = gk_duckdb_sql(
        f"read_parquet('{path}')",
        "o_orderkey",
        num_groups=num_groups,
        k_build=k_b,
        k_compress=k_c,
    )
    con = duckdb.connect()
    want = sorted(tuple(map(int, row)) for row in con.execute(sql).fetchall())
    assert got == want


def test_float_value_column_raises(spark):
    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="integral value column"):
        gk_build(df, "v")


def test_empty_summary_query_raises(spark):
    df = spark.createDataFrame([], "v long")
    summ = gk_summary(df, "v", 8, 8)
    with pytest.raises(ValueError, match="empty summary"):
        gk_quantiles(summ, [0.5])


def test_build_shuffles_on_group_not_globally(spark):
    """The scale pin: a grouped build's sort is window-local after ONE
    hash exchange on the group key — no global range exchange."""
    df = spark.range(0, 10000).select(F.col("id").alias("v"))
    pts = gk_build(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(4)))
    plan = pts._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" not in plan
    assert plan.count("exchange") == 1


def test_python_twin_matches_dataframe_ops(spark):
    """The pure-Python kernels (the streaming state form) implement the
    SAME algebra as the DataFrame operators — build, n-way merge, and
    compress agree point-for-point on a duplicated multiset."""
    from knovexlite_spark.ops.quantile import (
        py_gk_build,
        py_gk_compress,
        py_gk_merge,
    )

    vals = _multiset(21, 600)
    groups = 3
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    pts = gk_build(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(groups)))
    py_parts = [
        py_gk_build([v for v in vals if v % groups == g], 8)
        for g in range(groups)
    ]
    got_built = sorted(
        (r["src"], r["v"], r["rmin"], r["rmax"]) for r in pts.collect()
    )
    want_built = sorted(
        (g, v, lo, hi)
        for g, part in enumerate(py_parts)
        for v, lo, hi in part
    )
    assert got_built == want_built
    merged = gk_merge(pts, sources=list(range(groups)))
    got_m = sorted((r["v"], r["rmin"], r["rmax"]) for r in merged.collect())
    want_m = sorted(py_gk_merge(py_parts))
    assert got_m == want_m
    comp = gk_compress(merged, k=5)
    got_c = sorted((r["v"], r["rmin"], r["rmax"]) for r in comp.collect())
    want_c = sorted(py_gk_compress(sorted(py_gk_merge(py_parts)), 5))
    assert got_c == want_c


def test_merge_tree_single_round_equals_flat_merge(spark):
    """P <= fan_in: the tree is one round over one batch — point-for-
    point identical to gk_merge (same windows, dense-rank relabel)."""
    from knovexlite_spark.ops.quantile import gk_merge_tree

    vals = _multiset(31, 700)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    pts = gk_build(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(4)))
    flat = sorted(
        (r["osrc"], r["v"], r["rmin"], r["rmax"])
        for r in gk_merge(pts, sources=[0, 1, 2, 3]).collect()
    )
    tree = sorted(
        (r["osrc"], r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(pts, fan_in=16, sources=[0, 1, 2, 3]).collect()
    )
    assert flat == tree


def test_merge_tree_64_sources_keeps_brackets(spark):
    """The scale form: 64 per-partition summaries merged at fan_in=8
    (two rounds, each ONE window pass serving every batch) — exact
    bracketing and the rmax == N invariant hold, and the result is
    deterministic across partition layouts."""
    from knovexlite_spark.ops.quantile import gk_merge_tree

    vals = _multiset(41, 4000)
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(7)
    grp = F.pmod(F.xxhash64(F.col("v")), F.lit(64))
    pts = gk_build(df, "v", k=4, group_col=grp)
    merged = gk_merge_tree(pts, fan_in=8, sources=list(range(64)))
    mpts = [(r["v"], r["rmin"], r["rmax"]) for r in merged.collect()]
    _exact_bracket_check(mpts, vals)
    assert max(r[2] for r in mpts) == len(vals)
    comp = gk_compress(merged, k=16)
    cpts = [(r["v"], r["rmin"], r["rmax"]) for r in comp.collect()]
    _exact_bracket_check(cpts, vals)
    # determinism across layouts
    df2 = spark.createDataFrame([(v,) for v in vals], "v long").repartition(23)
    pts2 = gk_build(df2, "v", k=4, group_col=grp)
    again = sorted(
        map(
            tuple,
            gk_compress(
                gk_merge_tree(pts2, fan_in=8, sources=list(range(64))), k=16
            ).collect(),
        )
    )
    assert sorted(map(tuple, comp.collect())) == again


def test_summary_routes_through_merge_tree(spark):
    """gk_summary(merge_fan_in=) produces a valid bracketing summary
    whose answers stay inside the error budget with P=32 groups."""
    import math

    vals = _multiset(51, 3000)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    summ = gk_summary(df, "v", 16, 16, num_groups=32, merge_fan_in=8)
    pts = [(r["v"], r["rmin"], r["rmax"]) for r in summ.collect()]
    _exact_bracket_check(pts, vals)
    n = len(vals)
    answers = gk_quantiles(summ, [0.5, 0.9])
    arr = sorted(vals)
    import bisect

    # tree depth adds one level of neighbor slack per round: budget
    # n/k_build per level (2 levels at P=32, fan_in=8) + band gap
    tol = max(8, 2 * n // 16 + n // 16)
    for f, a in zip([0.5, 0.9], answers):
        got_rank = bisect.bisect_right(arr, a)
        target = max(1, math.ceil(f * n))
        assert abs(got_rank - target) <= tol, (f, got_rank, target, tol)


def test_weighted_build_matches_row_build_semantics(spark):
    """gk_build_weighted (groupBy(v)+cumulative weights — the skew/low-
    cardinality form) produces exact order statistics: every point's
    rank is count(<= v), brackets hold, rmax == n per group, queries
    land within the same budget as the row build, and a pre-aggregated
    (value, count) frame gives the identical summary."""
    from knovexlite_spark.ops.quantile import gk_build_weighted

    vals = _multiset(61, 900)
    df = spark.createDataFrame([(v,) for v in vals], "v long").repartition(6)
    grp = F.pmod(F.col("v"), F.lit(3))
    pts = gk_build_weighted(df, "v", k=8, group_col=grp)
    for g in range(3):
        gvals = sorted(v for v in vals if v % 3 == g)
        gp = [
            (r["v"], r["rmin"], r["rmax"])
            for r in pts.filter(F.col("src") == g).collect()
        ]
        import bisect

        for v, rmin, rmax in gp:
            assert rmin == rmax
            assert rmin == bisect.bisect_right(gvals, v)  # cum == count(<= v)
        assert max(r[2] for r in gp) == len(gvals)
        assert min(r[0] for r in gp) == gvals[0]  # first value kept
    # pre-aggregated input path: identical summary
    agg = (
        df.groupBy("v")
        .agg(F.count("*").cast("long").alias("w"))
    )
    pts2 = gk_build_weighted(agg, "v", k=8, group_col=grp, weight_col="w")
    assert sorted(map(tuple, pts.collect())) == sorted(
        map(tuple, pts2.collect())
    )
    # composes with merge + compress and keeps query error in budget
    from knovexlite_spark.ops.quantile import gk_merge

    summ = gk_compress(gk_merge(pts, sources=[0, 1, 2]), k=8)
    spts = [(r["v"], r["rmin"], r["rmax"]) for r in summ.collect()]
    _exact_bracket_check(spts, vals)
    import math

    n = len(vals)
    arr = sorted(vals)
    import bisect

    for f, a in zip([0.5, 0.9], gk_quantiles(summ, [0.5, 0.9])):
        got = bisect.bisect_right(arr, a)
        target = max(1, math.ceil(f * n))
        assert abs(got - target) <= max(8, n // 8 + n // 8)


def test_weighted_build_sorts_distinct_values_only(spark):
    """The scale pin for the weighted form: the row-sized pass is a
    COMBINABLE aggregation (map-side partials before its exchange),
    and everything after — the second exchange and the window sort —
    runs on the DISTINCT-VALUE frame; no rangepartitioning anywhere."""
    from knovexlite_spark.ops.quantile import gk_build_weighted

    df = spark.range(0, 20000).select((F.col("id") % 50).alias("v"))
    pts = gk_build_weighted(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(4)))
    plan = pts._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" not in plan
    assert "partial" in plan  # map-side combine before the exchange
    assert pts.count() <= 4 * (8 + 2)


def test_tree_duckdb_replay_is_engine_exact(spark):
    """The SCALE path oracle twin: build -> gk_merge_tree (8 groups,
    fan_in=4 — two rounds) -> compress replayed engine-for-engine by
    the GENERATED multi-round SQL."""
    import duckdb

    from knovexlite_spark.ops.quantile import gk_merge_tree, gk_tree_duckdb_sql

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    ng, fi, k_b, k_c = 8, 4, 8, 16
    pts = gk_build(
        orders, "o_orderkey", k=k_b,
        group_col=F.pmod(F.col("o_orderkey"), F.lit(ng)),
    )
    summ = gk_compress(
        gk_merge_tree(pts, fan_in=fi, sources=list(range(ng))), k=k_c
    )
    got = sorted(
        (r["idx"], r["v"], r["rmin"], r["rmax"]) for r in summ.collect()
    )
    sql = gk_tree_duckdb_sql(
        f"read_parquet('{path}')", "o_orderkey",
        num_groups=ng, fan_in=fi, k_build=k_b, k_compress=k_c,
    )
    want = sorted(
        tuple(map(int, row))
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_flat_merge_survives_empty_declared_sources(spark):
    """ADVICE r10 pin: low-cardinality input under num_groups=P leaves
    some residue classes EMPTY; a declared-but-empty source must
    contribute nothing (both window aggs NULL -> 0), not NULL-poison
    every rmax.  3 distinct values, 8 groups, flat merge (no fan_in) —
    and the generated DuckDB replay stays in lockstep."""
    import duckdb

    vals = [5, 5, 9, 9, 9, 13]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    # flat-merge path through gk_summary with P >> distinct values
    pts = gk_build(df, "v", k=8, group_col=F.pmod(F.col("v"), F.lit(8)))
    merged = gk_merge(pts, sources=list(range(8)))
    rows = [(r["v"], r["rmin"], r["rmax"]) for r in merged.collect()]
    assert all(r[1] is not None and r[2] is not None for r in rows)
    _exact_bracket_check(rows, vals)
    summ = gk_compress(merged, k=8)
    assert gk_quantiles(summ, [0.0, 0.5, 1.0]) == [5, 9, 13]
    # engine lockstep on the same constants (residue groups, 8 declared)
    got = sorted(
        (r["idx"], r["v"], r["rmin"], r["rmax"]) for r in summ.collect()
    )
    sql = gk_duckdb_sql(
        "(SELECT * FROM (VALUES (5),(5),(9),(9),(9),(13)) t(v))",
        "v", num_groups=8, k_build=8, k_compress=8,
    )
    want = sorted(
        tuple(map(int, row))
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_weighted_build_drops_nonpositive_weights(spark):
    """ADVICE r10 pin: zero/negative weights break the cumulative-rank
    math (bogus 'exact' points / non-monotone cum) — they drop like
    NULL keys, so a poisoned rollup row cannot corrupt brackets."""
    from knovexlite_spark.ops.quantile import gk_build_weighted

    rows = [(1, 3), (2, 0), (3, -5), (4, 2), (5, 1)]
    df = spark.createDataFrame(rows, "v long, w long")
    pts = gk_build_weighted(df, "v", k=8, weight_col="w")
    got = sorted((r["v"], r["rmin"], r["rmax"]) for r in pts.collect())
    # surviving multiset: 1,1,1,4,4,5 — cum ranks 3, 5, 6
    assert got == [(1, 3, 3), (4, 5, 5), (5, 6, 6)]


def test_null_group_rows_drop_and_bad_fraction_raises(spark):
    """Hardening pins: a NULL group key drops at build (instead of
    surfacing later as a crash in the merge's source collection), and
    out-of-range query fractions raise."""
    df = spark.createDataFrame(
        [(1, 0), (2, None), (3, 1)], "v long, g int"
    )
    pts = gk_build(df, "v", k=8, group_col="g")
    assert sorted(r["v"] for r in pts.collect()) == [1, 3]
    summ = gk_summary(df.select("v"), "v", 8, 8)
    with pytest.raises(ValueError, match="fraction"):
        gk_quantiles(summ, [1.5])


# ---------------------------------------------------------------------------
# Per-key grouped quantiles (round 11) — the one-pass p50/p95/p99-per-
# business-key surface.  Contract: exact per-key bracketing at every
# stage, rollup merge per key, distributed answers within the error
# budget, engine-exact DuckDB replay, and the scale plan shape.
# ---------------------------------------------------------------------------


def _keyed_multiset(seed: int, n: int, n_keys: int):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n)
    vals = rng.integers(0, max(4, n // 5), size=n)
    return [(int(k), int(v)) for k, v in zip(keys, vals)]


def test_by_key_build_is_exact_per_key(spark):
    """gk_build_by_key points are exact order statistics WITHIN each
    key; rmax tops out at the key's count; ends always kept."""
    import bisect

    from knovexlite_spark.ops.quantile import gk_build_by_key

    rows = _keyed_multiset(71, 1200, 5)
    df = spark.createDataFrame(rows, "key long, v long").repartition(7)
    pts = gk_build_by_key(df, "key", "v", k=8)
    by_key = {}
    for r in pts.collect():
        by_key.setdefault(r["key"], []).append((r["v"], r["rmin"], r["rmax"]))
    assert set(by_key) == {k for k, _ in rows}
    for key, kpts in by_key.items():
        kvals = sorted(v for k, v in rows if k == key)
        for v, rmin, rmax in kpts:
            assert rmin == rmax
            assert rmin == bisect.bisect_right(kvals, v)
        assert max(p[2] for p in kpts) == len(kvals)
        assert min(p[0] for p in kpts) == kvals[0]


def test_by_key_rollup_merge_and_compress_keep_brackets(spark):
    """Daily-rollup shape: build per (key, day-source), merge the
    sources within each key, compress per key — brackets stay valid
    against each key's full multiset and distributed answers land
    within the budget."""
    import bisect
    import math

    from knovexlite_spark.ops.quantile import (
        gk_quantiles_by_key,
        gk_summary_by_key,
    )

    rows = _keyed_multiset(72, 3000, 4)
    df = spark.createDataFrame(rows, "key long, v long").repartition(9)
    summ = gk_summary_by_key(
        df, "key", "v", k_build=16, k_compress=16,
        src_col=F.pmod(F.col("v"), F.lit(3)), sources=[0, 1, 2],
    )
    by_key = {}
    for r in summ.collect():
        by_key.setdefault(r["key"], []).append((r["v"], r["rmin"], r["rmax"]))
    for key, kpts in by_key.items():
        kvals = [v for k, v in rows if k == key]
        _exact_bracket_check(kpts, kvals)
        assert max(p[2] for p in kpts) == len(kvals)
    ans = gk_quantiles_by_key(summ, "key", [0.5, 0.95])
    got = {
        (r["key"], r["q_num"], r["q_den"]): r["v"] for r in ans.collect()
    }
    assert len(got) == len(by_key) * 2
    for key in by_key:
        kvals = sorted(v for k, v in rows if k == key)
        n = len(kvals)
        tol = max(8, 2 * (n // 16) + n // 16 + n // 16)
        for f, num, den in [(0.5, 1, 2), (0.95, 19, 20)]:
            a = got[(key, num, den)]
            rank = bisect.bisect_right(kvals, a)
            target = max(1, math.ceil(f * n))
            assert abs(rank - target) <= tol, (key, f, rank, target, tol)


def test_by_key_source_absent_from_a_key_is_harmless(spark):
    """A rollup source with no rows for some key (yesterday had no
    traffic for this domain) must not NULL-poison that key's merge."""
    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_merge_by_key,
    )

    rows = [("a", 0, 1), ("a", 0, 2), ("a", 1, 3), ("b", 0, 10)]
    df = spark.createDataFrame(rows, "key string, day int, v long")
    pts = gk_build_by_key(df, "key", "v", k=8, src_col="day")
    merged = gk_merge_by_key(pts, "key", sources=[0, 1])
    got = [
        (r["key"], r["v"], r["rmin"], r["rmax"]) for r in merged.collect()
    ]
    assert all(rmin is not None and rmax is not None for _, _, rmin, rmax in got)
    _exact_bracket_check(
        [(v, lo, hi) for k, v, lo, hi in got if k == "a"], [1, 2, 3]
    )
    _exact_bracket_check(
        [(v, lo, hi) for k, v, lo, hi in got if k == "b"], [10]
    )


def test_by_key_duckdb_replay_is_engine_exact(spark):
    """Build -> per-key merge -> per-key compress -> rank answers,
    replayed engine-for-engine by the GENERATED SQL on real data
    (orders cents keyed by custkey residue, value-residue sources)."""
    import duckdb

    from knovexlite_spark.ops.quantile import (
        gk_by_key_duckdb_sql,
        gk_quantiles_by_key,
        gk_summary_by_key,
    )

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    cents = F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
    ns, k_b, k_c = 3, 8, 12
    fracs = [0.5, 0.95, 0.99]
    df = orders.select(
        F.pmod(F.col("o_custkey"), F.lit(5)).alias("key"),
        cents.alias("cents"),
    )
    summ = gk_summary_by_key(
        df, "key", "cents", k_build=k_b, k_compress=k_c,
        src_col=F.pmod(F.col("cents"), F.lit(ns)), sources=list(range(ns)),
    )
    ans = gk_quantiles_by_key(summ, "key", fracs)
    got = sorted(tuple(int(x) for x in r) for r in ans.collect())
    sql = gk_by_key_duckdb_sql(
        f"read_parquet('{path}')",
        "o_custkey % 5",
        "CAST(round(o_totalprice * 100) AS BIGINT)",
        num_sources=ns,
        fracs=fracs,
        k_build=k_b,
        k_compress=k_c,
    )
    want = sorted(
        tuple(map(int, row))
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_by_key_plan_shape(spark):
    """Scale pins: the row-sized pass is a COMBINABLE groupBy (partial
    aggregate before its exchange), no RangePartitioning anywhere (all
    sorts are per-key window sorts), and the whole chain runs in ONE
    job shape — no driver loop over keys."""
    from knovexlite_spark.ops.quantile import (
        gk_quantiles_by_key,
        gk_summary_by_key,
    )

    df = spark.range(0, 30000).select(
        (F.col("id") % 64).alias("key"), (F.col("id") % 997).alias("v")
    )
    ans = gk_quantiles_by_key(
        gk_summary_by_key(df, "key", "v", 16, 16), "key", [0.5, 0.99]
    )
    plan = ans._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" not in plan
    assert "partial" in plan
    assert ans.count() == 64 * 2


def test_by_key_rejects_bad_inputs(spark):
    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_quantiles_by_key,
    )

    df = spark.createDataFrame([(1, 2)], "key long, v long")
    with pytest.raises(ValueError, match="k must be"):
        gk_build_by_key(df, "key", "v", k=0)
    with pytest.raises(ValueError, match="at least one"):
        gk_build_by_key(df, [], "v")
    with pytest.raises(ValueError, match="fraction"):
        gk_quantiles_by_key(gk_build_by_key(df, "key", "v"), "key", [1.5])
    # NULL keys drop like the global form's NULL groups
    df2 = spark.createDataFrame(
        [(None, 1), (3, 2)], "key bigint, v long"
    )
    pts = gk_build_by_key(df2, "key", "v", k=8)
    assert [r["key"] for r in pts.collect()] == [3]


def test_summary_autoroutes_to_tree_above_32_sources(spark):
    """VERDICT r10 #5: P=64 WITHOUT an explicit merge_fan_in must route
    through the merge tree at fan_in=16 — since round 16 the tree runs
    inside the Arrow kernel (gk_tree_compress_local: a MapInPandas in
    the executed plan), so the routing is pinned by point-for-point
    equality to the EXPLICIT fan_in=16 window-SQL tree; small P must
    keep the flat-merge result (kernel single >=p-fan round)."""
    from knovexlite_spark.ops.quantile import gk_merge, gk_merge_tree

    vals = _multiset(81, 4000)
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    summ = gk_summary(df, "v", 16, 16, num_groups=64)
    plan = summ._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, "kernel merge missing from the plan"
    got = sorted(map(tuple, summ.collect()))
    grp = F.pmod(F.xxhash64(F.col("v")), F.lit(64))
    pts = gk_build(df, "v", k=16, group_col=grp)
    want_tree = sorted(
        map(
            tuple,
            gk_compress(
                gk_merge_tree(pts, fan_in=16, sources=list(range(64))), k=16
            ).collect(),
        )
    )
    assert got == want_tree
    _exact_bracket_check([(v, lo, hi) for _, v, lo, hi in got], vals)
    # small P keeps the flat-merge values
    small = sorted(
        map(tuple, gk_summary(df, "v", 16, 16, num_groups=4).collect())
    )
    grp4 = F.pmod(F.xxhash64(F.col("v")), F.lit(4))
    pts4 = gk_build(df, "v", k=16, group_col=grp4)
    want_flat = sorted(
        map(
            tuple,
            gk_compress(
                gk_merge(pts4, sources=list(range(4))), k=16
            ).collect(),
        )
    )
    assert small == want_flat


def test_frac_rationals_exact_fraction_passthrough():
    """VERDICT r11 #6: a caller passing Fraction(1, 3) gets the true
    1/3 rank target, not 333333/1000000 (the float-roundtrip rational
    the old path silently substituted); floats keep the
    limit_denominator route and out-of-range Fractions stay loud."""
    from fractions import Fraction

    import pytest as _pytest

    from knovexlite_spark.ops.quantile import _frac_rationals

    assert _frac_rationals([Fraction(1, 3)]) == [(1, 3)]
    assert _frac_rationals([Fraction(19, 20), 0.5]) == [(19, 20), (1, 2)]
    # float path unchanged: 0.95 still reduces to 19/20
    assert _frac_rationals([0.95]) == [(19, 20)]
    with _pytest.raises(ValueError, match="fraction"):
        _frac_rationals([Fraction(4, 3)])
    with _pytest.raises(ValueError, match="fraction"):
        _frac_rationals([Fraction(-1, 3)])
    # the rank target rides q_num * N in LONG arithmetic: an unbounded
    # denominator (hence numerator) could overflow silently at large N
    with _pytest.raises(ValueError, match="denominator"):
        _frac_rationals([Fraction(999_999_999, 1_000_000_007)])


def test_gk_quantiles_by_key_rejects_duplicate_fractions(spark):
    """Review finding: answers are keyed by the reduced rational, so
    duplicate fractions silently collapsed to one row; now loud."""
    import pytest as _pytest

    from knovexlite_spark.ops.quantile import gk_quantiles_by_key, gk_summary_by_key

    df = spark.range(100).selectExpr("id % 2 AS k", "id AS v")
    summ = gk_summary_by_key(df, "k", "v", k_build=8, k_compress=8)
    with _pytest.raises(ValueError, match="duplicate rationals"):
        gk_quantiles_by_key(summ, "k", [0.5, 0.5])


# -- gk_merge_tree_by_key: the per-key rollup merge tree (round 12) -----------


def _per_key_vals(seed: int, n: int, n_keys: int):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, size=n)
    vals = rng.integers(0, max(4, n // 4), size=n)
    return [(int(k), int(v)) for k, v in zip(keys, vals)]


def test_by_key_tree_single_round_equals_flat_merge(spark):
    """P <= fan_in: gk_merge_tree_by_key is POINT-FOR-POINT the flat
    gk_merge_by_key (same invariant the global tree pins)."""
    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_merge_by_key,
        gk_merge_tree_by_key,
    )

    rows = _per_key_vals(61, 900, 4)
    df = spark.createDataFrame(rows, "key long, v long")
    pts = gk_build_by_key(
        df, "key", "v", k=8, src_col=F.pmod(F.col("v"), F.lit(3))
    )
    flat = sorted(map(tuple, gk_merge_by_key(pts, "key", sources=[0, 1, 2]).collect()))
    tree = sorted(
        map(
            tuple,
            gk_merge_tree_by_key(pts, "key", fan_in=4, sources=[0, 1, 2]).collect(),
        )
    )
    assert flat == tree


def test_by_key_tree_multi_round_brackets_per_key(spark):
    """8 sources at fan_in=3 -> TWO load-bearing rounds; every key's
    brackets stay valid against that key's multiset, the rank-N point
    survives per key, and the compressed summary answers sane
    quantiles per key."""
    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_compress_by_key,
        gk_merge_tree_by_key,
    )

    rows = _per_key_vals(67, 1400, 5)
    df = spark.createDataFrame(rows, "key long, v long")
    pts = gk_build_by_key(
        df, "key", "v", k=6, src_col=F.pmod(F.col("v"), F.lit(8))
    )
    merged = gk_merge_tree_by_key(
        pts, "key", fan_in=3, sources=list(range(8))
    )
    by_key: dict[int, list] = {}
    for r in merged.collect():
        by_key.setdefault(r["key"], []).append((r["v"], r["rmin"], r["rmax"]))
    assert set(by_key) == {k for k, _ in rows}
    for key, kpts in by_key.items():
        kvals = [v for k, v in rows if k == key]
        _exact_bracket_check(kpts, kvals)
        assert max(p[2] for p in kpts) == len(kvals)
    comp = gk_compress_by_key(merged, "key", k=8)
    for r in comp.collect():
        kvals = [v for k, v in rows if k == r["key"]]
        _exact_bracket_check([(r["v"], r["rmin"], r["rmax"])], kvals)


def test_by_key_tree_source_absent_from_a_key_is_harmless(spark):
    """A rollup source with no rows for some key (yesterday had no
    events for this domain) proves nothing in that key's batches and
    must contribute nothing — including across round boundaries."""
    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_merge_tree_by_key,
    )

    # key 0 spans all 6 sources; key 1 only sources 0 and 5 (different
    # level-1 batches at fan_in=2, so round 2 sees an absent batch too)
    rows = [(0, s, 10 * s + d) for s in range(6) for d in range(3)]
    rows += [(1, 0, 7), (1, 0, 8), (1, 5, 9)]
    df = spark.createDataFrame(rows, "key long, src long, v long")
    pts = gk_build_by_key(df, "key", "v", k=8, src_col="src")
    merged = gk_merge_tree_by_key(
        pts, "key", fan_in=2, sources=list(range(6))
    )
    by_key: dict[int, list] = {}
    for r in merged.collect():
        assert r["rmin"] is not None and r["rmax"] is not None
        by_key.setdefault(r["key"], []).append((r["v"], r["rmin"], r["rmax"]))
    for key in (0, 1):
        kvals = [v for k, s, v in rows if k == key]
        _exact_bracket_check(by_key[key], kvals)
        assert max(p[2] for p in by_key[key]) == len(kvals)


def test_by_key_tree_plan_windows_bounded_by_fan_in(spark):
    """The codegen-pressure pin (VERDICT r11 #2): with 64 rollup
    sources at fan_in=8, NO Window stacks more than 3*fan_in
    conditional aggregates — every __p/__s/__n local id stays below
    fan_in (the flat merge would emit __p0..__p63)."""
    import re

    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_merge_tree_by_key,
    )

    rows = _per_key_vals(71, 2000, 3)
    df = spark.createDataFrame(rows, "key long, v long")
    pts = gk_build_by_key(
        df, "key", "v", k=4, src_col=F.pmod(F.col("v"), F.lit(64))
    )
    # ckpt_rounds=False keeps the full lineage visible (the default
    # checkpoint truncates each round's plan, hiding the windows)
    merged = gk_merge_tree_by_key(
        pts, "key", fan_in=8, sources=list(range(64)), ckpt_rounds=False
    )
    key = "spark.sql.debug.maxToStringFields"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "10000")  # full field lists, no '... N more'
    try:
        plan = merged._jdf.queryExecution().analyzed().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    locals_seen = {int(m) for m in re.findall(r"__p(\d+)", plan)}
    assert locals_seen, "no window locals found in plan"
    assert max(locals_seen) < 8, sorted(locals_seen)
    # and the windows partition by the business key (per-key merge)
    assert "key" in plan


def test_by_key_summary_autoroutes_to_tree_above_32_sources(spark):
    """gk_summary_by_key parity with gk_summary: 40 rollup sources
    WITHOUT an explicit merge_fan_in route through the per-key tree
    (checkpoint-scan plan signature), point-for-point equal to the
    explicit fan_in=16 tree; few sources keep the flat merge."""
    import re

    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_compress_by_key,
        gk_merge_tree_by_key,
        gk_summary_by_key,
    )

    rows = _per_key_vals(73, 1600, 4)
    df = spark.createDataFrame(rows, "key long, v long")
    auto = gk_summary_by_key(
        df, "key", "v", k_build=6, k_compress=8,
        src_col=F.pmod(F.col("v"), F.lit(40)),
    )
    # the tree's round checkpoints carry (key, src, OSRC, ...); the
    # build-output checkpoint on the collect path carries no osrc, so
    # requiring it keeps the signal tree-specific
    ckpt_scan = re.compile(r"Scan ExistingRDD\[key#\d+L?,\s*src#\d+L?,\s*osrc")
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert ckpt_scan.search(plan), "40 sources did not route through the tree"
    pts = gk_build_by_key(
        df, "key", "v", k=6, src_col=F.pmod(F.col("v"), F.lit(40))
    )
    want = gk_compress_by_key(
        gk_merge_tree_by_key(pts, "key", fan_in=16, sources=list(range(40))),
        "key",
        k=8,
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, want.collect()))
    small = gk_summary_by_key(
        df, "key", "v", k_build=6, k_compress=8,
        src_col=F.pmod(F.col("v"), F.lit(3)),
    )
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert not ckpt_scan.search(plan_small)


def test_by_key_tree_duckdb_replay_is_engine_exact(spark):
    """The per-key SCALE path oracle twin: per-key build -> two-round
    tree -> per-key compress replayed engine-for-engine by the
    GENERATED multi-round SQL, state AND answers."""
    import duckdb

    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_by_key_tree_duckdb_sql,
        gk_compress_by_key,
        gk_merge_tree_by_key,
        gk_quantiles_by_key,
    )

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    nk, ns, fi, k_b, k_c = 5, 8, 4, 8, 12
    fracs = [0.5, 0.95, 0.99]
    src = orders.select(
        F.pmod(F.col("o_custkey"), F.lit(nk)).alias("key"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pts = gk_build_by_key(
        src, "key", "cents", k=k_b,
        src_col=F.pmod(F.col("cents"), F.lit(ns)),
    )
    summ = gk_compress_by_key(
        gk_merge_tree_by_key(pts, "key", fan_in=fi, sources=list(range(ns))),
        "key",
        k=k_c,
    )
    got = sorted(
        (r["key"], r["idx"], r["v"], r["rmin"], r["rmax"])
        for r in summ.collect()
    )
    rel = f"(SELECT * FROM read_parquet('{path}'))"
    sql = gk_by_key_tree_duckdb_sql(
        rel, "o_custkey % 5", "CAST(round(o_totalprice * 100) AS BIGINT)",
        num_sources=ns, fan_in=fi, fracs=fracs,
        k_build=k_b, k_compress=k_c, emit="summary",
    )
    want = sorted(
        tuple(map(int, row))
        for row in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want
    ans = sorted(
        (r["key"], r["q_num"], r["q_den"], r["v"])
        for r in gk_quantiles_by_key(summ, "key", fracs).collect()
    )
    sql_a = gk_by_key_tree_duckdb_sql(
        rel, "o_custkey % 5", "CAST(round(o_totalprice * 100) AS BIGINT)",
        num_sources=ns, fan_in=fi, fracs=fracs,
        k_build=k_b, k_compress=k_c, emit="answers",
    )
    want_a = sorted(
        tuple(map(int, row))
        for row in duckdb.connect().execute(sql_a).fetchall()
    )
    assert ans == want_a


def test_summary_default_path_stays_lazy(spark):
    """gk_summary with BOTH group knobs unset knows its source list
    statically ([0] — gk_build emits src = lit(0)), so construction
    must trigger NO job (round-12 ADVICE: the source-discovery
    collect only runs when the list is genuinely unknown).  Pinned
    with a frame that RAISES on any evaluation: construction passes,
    collection raises."""
    from pyspark.errors import PySparkException

    df = spark.range(4).select(
        F.raise_error(F.lit("evaluated during construction")).cast("long").alias("v")
    )
    summ = gk_summary(df, "v", k_build=4, k_compress=4)  # must not raise
    with pytest.raises(PySparkException):
        summ.collect()  # ...but the frame is real and still evaluates


def test_tree_replay_rejects_out_of_contract_sources(spark):
    """The tree replays batch by src div fan_in, which matches Spark
    only for contiguous 0-based ids — an id outside [0, P) must RAISE
    inside the query (round-12 ADVICE: previously it silently batched
    differently, a false oracle mismatch with e.g. negative values
    under sign-following %)."""
    import duckdb

    from knovexlite_spark.ops.quantile import (
        gk_by_key_tree_duckdb_sql,
        gk_tree_duckdb_sql,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (-7), (3), (11)) v(x)"
    )
    # negative value -> sign-following % yields a negative src id
    sql = gk_tree_duckdb_sql("t", "x", num_groups=4, fan_in=2)
    with pytest.raises(duckdb.Error, match="contiguous"):
        con.execute(sql).fetchall()
    sql_k = gk_by_key_tree_duckdb_sql(
        "t", "1", "x", num_sources=4, fan_in=2, fracs=[0.5]
    )
    with pytest.raises(duckdb.Error, match="contiguous"):
        con.execute(sql_k).fetchall()
    # pmod-shaped expressions stay in contract and run clean
    ok = gk_tree_duckdb_sql(
        "t", "x", num_groups=4, fan_in=2, group_expr="((v % 4) + 4) % 4"
    )
    assert con.execute(ok).fetchall()


def test_merge_tree_rank_mapping_is_broadcast_not_literal(spark):
    """Round-12 judge finding: the trees embedded a 2*P-entry
    create_map literal mapping source ids to dense ranks — on the
    *_build_local paths P is the input's physical partition count
    (10^4-10^5 at corpus scale), a Catalyst expression-tree/codegen
    hazard exactly on the scale path.  The mapping is now a BROADCAST
    (src, __r) join (non-dense ids) or the identity (dense ids — every
    round after the first).  Pinned at 10^4 NON-CONTIGUOUS sources:
    the plan stays literal-free and bounded, and the merged brackets
    stay exact."""
    from knovexlite_spark.ops.quantile import gk_merge_tree

    n = 10_000
    # 10^4 singleton summaries with ODD source ids (non-contiguous,
    # so the identity fast path cannot hide the join)
    pts = spark.range(n).selectExpr(
        "id * 2 + 1 AS src",
        "id AS v",
        "CAST(1 AS BIGINT) AS rmin",
        "CAST(1 AS BIGINT) AS rmax",
    )
    # ckpt_rounds=False so the final plan NESTS every round (the
    # default's lazy per-round checkpoints truncate it) — that is
    # exactly the shape whose literal would blow up
    merged = gk_merge_tree(
        pts, fan_in=16, sources=[2 * i + 1 for i in range(n)],
        ckpt_rounds=False,
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "map_keys" not in plan and "create_map" not in plan
    assert "Broadcast" in plan  # round 1's rank lookup joins in
    # the old literal made the plan string O(P); pin a hard ceiling
    # far under the 20k-literal blow-up but far over a healthy plan
    assert len(plan) < 400_000, len(plan)
    rows = merged.collect()
    assert len(rows) == n
    assert max(r["rmax"] for r in rows) == n  # rollup: last rank == N
    for r in rows:
        true_rank = r["v"] + 1  # distinct ascending values
        assert r["rmin"] <= true_rank <= r["rmax"], (
            r["v"], r["rmin"], r["rmax"])


def test_merge_tree_noncontiguous_equals_dense_relabel(spark):
    """The broadcast rank join must reproduce the dense-relabel
    semantics point-for-point: a tree over arbitrary sorted ids
    equals the tree over their dense relabel 0..P-1."""
    import numpy as np

    from knovexlite_spark.ops.quantile import gk_build, gk_merge_tree

    rng = np.random.default_rng(7)
    vals = [int(x) for x in rng.integers(0, 50, size=400)]
    ids = [3, 10, 47, 48, 90, 1000]  # arbitrary sorted, non-dense
    rows = [(ids[i % 6], v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g long, v long")
    pts = gk_build(df, "v", k=6, group_col="g")
    dense_pts = pts.selectExpr(
        f"CASE src {' '.join(f'WHEN {s} THEN {i}' for i, s in enumerate(ids))} END AS src",
        "v", "rmin", "rmax",
    )
    got = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(pts, fan_in=3, sources=ids).collect()
    )
    want = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(
            dense_pts, fan_in=3, sources=list(range(6))
        ).collect()
    )
    assert got == want


def test_dense_fast_path_drops_out_of_contract_sources(spark):
    """The identity fast path (sources == 0..P-1) must enforce the
    same contract as the broadcast-join path: points whose src is not
    in the declared list DROP (round-13 advice — a stray src >= P
    previously got __r = src and silently landed in a nonexistent
    batch, corrupting merged rank brackets)."""
    import numpy as np

    from knovexlite_spark.ops.quantile import gk_build, gk_merge_tree

    rng = np.random.default_rng(11)
    vals = [int(x) for x in rng.integers(0, 40, size=300)]
    rows = [(i % 3, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g long, v long")
    pts = gk_build(df, "v", k=6, group_col="g")
    # a stray summary under src=5, NOT in the declared dense [0, 1, 2]
    stray = spark.createDataFrame(
        [(5, 0, 1, 1), (5, 99, 2, 2)], "src long, v long, rmin long, rmax long"
    )
    got = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(
            pts.unionByName(stray), fan_in=3, sources=[0, 1, 2]
        ).collect()
    )
    want = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(pts, fan_in=3, sources=[0, 1, 2]).collect()
    )
    assert got == want


# -- gk_build_local: the bounded-memory batch build (round 13) ----------------


def test_gk_build_local_plan_is_map_only_and_summary_sized(spark):
    """The 100-TB pin: scan -> MapInPandas with NO Exchange anywhere
    (map-only — the round-12 judge finding was gk_build's full-row
    shuffle; this form never moves a raw row), and the output is
    bounded at ~k rows per physical partition."""
    from knovexlite_spark.ops.quantile import gk_build_local

    df = spark.range(0, 5000, 1, 4).selectExpr("id % 97 AS v")
    pts = gk_build_local(df, "v", k=8)
    plan = pts._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan
    rows = pts.collect()
    assert rows
    per_src: dict[int, int] = {}
    for r in rows:
        per_src[r["src"]] = per_src.get(r["src"], 0) + 1
    assert len(per_src) <= 4
    # ~k points per partition (compress keeps band crossers + ends)
    assert max(per_src.values()) <= 8 + 2


def test_gk_build_local_parity_with_py_kernels(spark):
    """One partition, one Arrow chunk: the operator's output IS the
    pinned kernel chain py_gk_compress(py_gk_merge([py_gk_build(.)]))."""
    import numpy as np

    from knovexlite_spark.ops.quantile import (
        gk_build_local,
        py_gk_build,
        py_gk_compress,
        py_gk_merge,
    )

    rng = np.random.default_rng(23)
    vals = [int(x) for x in rng.integers(0, 40, size=700)]
    df = spark.createDataFrame([(v,) for v in vals], "v long").coalesce(1)
    got = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_build_local(df, "v", k=9).collect()
    )
    want = sorted(py_gk_compress(py_gk_merge([py_gk_build(vals, 9)]), 9))
    assert got == want


def test_gk_summary_local_layout_independent_contract(spark):
    """The gate contract (the 'mgl_acc' pattern): whatever the
    partition layout, the merged summary keeps exact bracketing
    against the full multiset, the rollup rank (max rmax == N), both
    extremes, and the documented rank-error budget."""
    import numpy as np

    from knovexlite_spark.ops.quantile import gk_quantiles, gk_summary_local

    rng = np.random.default_rng(31)
    vals = [int(x) for x in rng.integers(0, 500, size=3000)]
    n = len(vals)
    for parts in (1, 5, 17):
        df = spark.createDataFrame(
            [(v,) for v in vals], "v long"
        ).repartition(parts)
        summ = gk_summary_local(df, "v", k=32, k_compress=24, fan_in=4)
        pts = [(r["v"], r["rmin"], r["rmax"]) for r in summ.collect()]
        _exact_bracket_check(pts, vals)
        assert max(p[2] for p in pts) == n
        assert min(p[0] for p in pts) == min(vals)
        assert max(p[0] for p in pts) == max(vals)
        # budget: build cascade (single chunk/partition here, ~n/32)
        # + one tree level per fan_in round (~n/32 each, <= 3 rounds
        # at 17 srcs fan 4... ceil(log4 17)=3) + compress (~n/24);
        # comfortably wide of all of it:
        tol = max(8, 5 * (n // 32) + n // 24)
        svals = sorted(vals)
        from knovexlite_spark.ops.quantile import py_gk_query

        for f in (0.1, 0.5, 0.9, 0.99):
            # driver-side query over the collected points
            [ans] = py_gk_query(sorted(pts), [f])
            import bisect
            import math

            target = max(1, int(math.ceil(f * n)))
            lt = bisect.bisect_left(svals, ans)
            le = bisect.bisect_right(svals, ans)
            dist = 0 if lt + 1 <= target <= le else min(
                abs(lt + 1 - target), abs(le - target)
            )
            assert dist <= tol, (parts, f, ans, target, tol)


def test_gk_summary_local_empty_input(spark):
    from knovexlite_spark.ops.quantile import gk_build_local, gk_summary_local

    empty = spark.createDataFrame([], "v long")
    assert gk_build_local(empty, "v", k=4).count() == 0
    out = gk_summary_local(empty, "v", k=4, k_compress=4)
    assert out.count() == 0
    assert out.columns == ["idx", "v", "rmin", "rmax"]


def test_gk_build_local_rejects_float_column(spark):
    from knovexlite_spark.ops.quantile import gk_build_local

    df = spark.createDataFrame([(1.5,)], "v double")
    with pytest.raises(ValueError, match="integral"):
        gk_build_local(df, "v")


def test_gk_build_local_weighted_matches_kernel_and_guards(spark):
    """weight_col at local-build scale: single partition/chunk output
    IS the weighted kernel chain; non-positive weights drop; float
    weight columns raise (the gk_build_weighted rules)."""
    from knovexlite_spark.ops.quantile import (
        gk_build_local,
        gk_summary_local,
        py_gk_build_weighted,
        py_gk_compress,
        py_gk_merge,
    )

    rows = [(5, 3), (1, 2), (5, 1), (9, 4), (2, -7), (7, 2)]
    df = spark.createDataFrame(rows, "v long, w long").coalesce(1)
    got = sorted(
        (r["v"], r["rmin"], r["rmax"])
        for r in gk_build_local(df, "v", k=3, weight_col="w").collect()
    )
    want = sorted(
        py_gk_compress(py_gk_merge([py_gk_build_weighted(rows, 3)]), 3)
    )
    assert got == want
    # end-to-end: summary over the weighted frame == summary over the
    # weight-expanded frame (same k everywhere, single source)
    expanded = [(v,) for v, w in rows if w > 0 for _ in range(w)]
    edf = spark.createDataFrame(expanded, "v long").coalesce(1)
    ws = sorted(
        map(tuple, gk_summary_local(df, "v", k=16, k_compress=16,
                                    weight_col="w").collect())
    )
    # brackets from both frames must agree on N (total weight)
    assert max(r[3] for r in ws) == len(expanded)
    es = sorted(
        map(tuple, gk_summary_local(edf, "v", k=16, k_compress=16).collect())
    )
    assert max(r[3] for r in es) == len(expanded)
    fdf = spark.createDataFrame([(1, 1.5)], "v long, w double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="integral weight"):
        gk_build_local(fdf, "v", weight_col="w")


def test_gk_build_local_by_key_plan_and_parity(spark):
    """Per-key local build: map-only plan (no (key, v) groupBy
    anywhere), and on one partition/chunk each key's output IS the
    pinned kernel chain over that key's values."""
    import numpy as np

    from knovexlite_spark.ops.quantile import (
        gk_build_local_by_key,
        py_gk_build,
        py_gk_compress,
        py_gk_merge,
    )

    rng = np.random.default_rng(41)
    rows = [
        (int(kk), int(vv))
        for kk, vv in zip(
            rng.integers(0, 3, size=900), rng.integers(0, 60, size=900)
        )
    ]
    df4 = spark.createDataFrame(rows, "k long, v long").repartition(4)
    pts4 = gk_build_local_by_key(df4, "k", "v", k=7)
    plan = pts4._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "hashpartitioning" not in plan, plan
    df1 = spark.createDataFrame(rows, "k long, v long").coalesce(1)
    got: dict = {}
    for r in gk_build_local_by_key(df1, "k", "v", k=7).collect():
        got.setdefault(r["k"], []).append((r["v"], r["rmin"], r["rmax"]))
    for kk in (0, 1, 2):
        vals = [v for key, v in rows if key == kk]
        want = sorted(
            py_gk_compress(py_gk_merge([py_gk_build(vals, 7)]), 7)
        )
        assert sorted(got[kk]) == want, kk


def test_gk_summary_local_by_key_layout_independent_contract(spark):
    """Whatever the layout: per-key exact bracketing, per-key rollup
    rank (max rmax == N_key), per-key extremes, and the per-key rank
    budget on p50/p95 answers."""
    import bisect
    import math

    import numpy as np

    from knovexlite_spark.ops.quantile import (
        gk_quantiles_by_key,
        gk_summary_local_by_key,
    )

    rng = np.random.default_rng(47)
    rows = [
        (int(kk), int(vv))
        for kk, vv in zip(
            rng.integers(0, 4, size=3200), rng.integers(0, 400, size=3200)
        )
    ]
    per_key: dict = {}
    for kk, vv in rows:
        per_key.setdefault(kk, []).append(vv)
    for parts in (1, 5, 13):
        df = spark.createDataFrame(rows, "k long, v long").repartition(parts)
        summ = gk_summary_local_by_key(
            df, "k", "v", k=24, k_compress=16, fan_in=4
        ).localCheckpoint(eager=False)
        pts: dict = {}
        for r in summ.collect():
            pts.setdefault(r["k"], []).append((r["v"], r["rmin"], r["rmax"]))
        for kk, vals in per_key.items():
            _exact_bracket_check(pts[kk], vals)
            assert max(p[2] for p in pts[kk]) == len(vals)
            assert min(p[0] for p in pts[kk]) == min(vals)
            assert max(p[0] for p in pts[kk]) == max(vals)
        ans = {
            (r["k"], r["q_num"], r["q_den"]): r["v"]
            for r in gk_quantiles_by_key(summ, "k", [0.5, 0.95]).collect()
        }
        for kk, vals in per_key.items():
            svals = sorted(vals)
            n = len(svals)
            tol = max(8, 5 * (n // 24) + n // 16)
            for num, den, f in ((1, 2, 0.5), (19, 20, 0.95)):
                a = ans[(kk, num, den)]
                target = max(1, int(math.ceil(f * n)))
                lt = bisect.bisect_left(svals, a)
                le = bisect.bisect_right(svals, a)
                dist = 0 if lt + 1 <= target <= le else min(
                    abs(lt + 1 - target), abs(le - target)
                )
                assert dist <= tol, (parts, kk, f, a, target, tol)


def test_gk_local_by_key_weighted_and_guards(spark):
    import pytest as _pytest

    from knovexlite_spark.ops.quantile import (
        gk_build_local_by_key,
        gk_summary_local_by_key,
    )

    rows = [(1, 5, 3), (1, 1, 2), (2, 9, 4), (1, 7, -2)]
    df = spark.createDataFrame(rows, "k long, v long, w long").coalesce(1)
    summ = gk_summary_local_by_key(
        df, "k", "v", k=8, k_compress=8, weight_col="w"
    )
    by_k: dict = {}
    for r in summ.collect():
        by_k.setdefault(r["k"], []).append((r["v"], r["rmax"]))
    # key 1: weights 3+2 (the -2 drops) -> N=5; key 2: N=4
    assert max(rm for _, rm in by_k[1]) == 5
    assert max(rm for _, rm in by_k[2]) == 4
    fdf = spark.createDataFrame([(1, 1.5)], "k long, v double")
    with _pytest.raises(ValueError, match="integral"):
        gk_build_local_by_key(fdf, "k", "v")
    empty = spark.createDataFrame([], "k long, v long")
    out = gk_summary_local_by_key(empty, "k", "v")
    assert out.count() == 0
    assert out.columns == ["k", "idx", "v", "rmin", "rmax"]


def test_gk_local_by_key_absent_cells_are_harmless(spark):
    """Keys hash-confined to single partitions: every other (key,
    partition) cell is ABSENT in the per-key tree merge (NULL window
    bounds) — the empty-source guard must leave each key's summary
    exactly its own partition's, with full per-key contract."""
    import numpy as np

    from knovexlite_spark.ops.quantile import gk_summary_local_by_key
    from pyspark.sql import functions as F_

    rng = np.random.default_rng(53)
    rows = [
        (int(kk), int(vv))
        for kk, vv in zip(
            rng.integers(0, 6, size=1800), rng.integers(0, 300, size=1800)
        )
    ]
    per_key: dict = {}
    for kk, vv in rows:
        per_key.setdefault(kk, []).append(vv)
    # hash-partition ON THE KEY: each key's rows land in exactly one
    # partition, so its src list has one live cell and 7+ absent ones
    df = spark.createDataFrame(rows, "k long, v long").repartition(
        8, F_.col("k")
    )
    summ = gk_summary_local_by_key(df, "k", "v", k=16, k_compress=12)
    pts: dict = {}
    for r in summ.collect():
        pts.setdefault(r["k"], []).append((r["v"], r["rmin"], r["rmax"]))
    assert set(pts) == set(per_key)
    for kk, vals in per_key.items():
        _exact_bracket_check(pts[kk], vals)
        assert max(p[2] for p in pts[kk]) == len(vals)
        assert min(p[0] for p in pts[kk]) == min(vals)
        assert max(p[0] for p in pts[kk]) == max(vals)


def test_merge_tree_sql_strings_match_column_form(spark):
    """Round-15 optimization pin: the SQL-string construction of the
    merge windows (one parser call per column, replacing per-node
    py4j Column building) must produce POINT-FOR-POINT the same
    output as the original Column-object formulation."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from knovexlite_spark.ops.quantile import gk_merge_tree

    random.seed(13)
    rows = []
    for s in range(9):
        vals = sorted(random.sample(range(500), 15))
        for i, v in enumerate(vals):
            rows.append((s, v, i + 1, i + 1))
    pts = spark.createDataFrame(rows, "src long, v long, rmin long, rmax long")
    got = sorted(
        (r["osrc"], r["v"], r["rmin"], r["rmax"])
        for r in gk_merge_tree(pts, fan_in=4, sources=list(range(9))).collect()
    )

    # the pre-round-15 Column-object formulation, verbatim, one round
    # at a time (fan_in=4 over 9 sources: 9 -> 3 -> 1)
    def column_round(cur, sources, fan_in):
        p = len(sources)
        staged_in = cur.filter(
            (F.col("src") >= 0) & (F.col("src") < p)
        ).withColumn("__r", F.col("src").cast("long")).select(
            F.expr(f"__r div {fan_in}").cast("long").alias("__batch"),
            (F.col("__r") % fan_in).cast("int").alias("__local"),
            "osrc", "v", "rmin", "rmax",
        )
        w_lt = (
            Window.partitionBy("__batch").orderBy("v")
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_gt = (
            Window.partitionBy("__batch").orderBy(F.col("v").desc())
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_all = Window.partitionBy("__batch")
        n_local = min(fan_in, p)
        cols = ["__batch", "__local", "osrc", "v", "rmin", "rmax"]
        for l in range(n_local):
            own = F.col("__local") == l
            cols.append(F.max(F.when(own, F.col("rmin"))).over(w_lt).alias(f"__p{l}"))
            cols.append(F.min(F.when(own, F.col("rmax"))).over(w_gt).alias(f"__s{l}"))
            cols.append(F.max(F.when(own, F.col("rmax"))).over(w_all).alias(f"__n{l}"))
        staged = staged_in.select(*cols)
        add_lo = None
        add_hi = None
        for l in range(n_local):
            lo = F.when(F.col("__local") == l, F.lit(0)).otherwise(
                F.coalesce(F.col(f"__p{l}"), F.lit(0)))
            hi = F.when(F.col("__local") == l, F.lit(0)).otherwise(
                F.coalesce(F.col(f"__s{l}") - 1, F.coalesce(F.col(f"__n{l}"), F.lit(0))))
            add_lo = lo if add_lo is None else add_lo + lo
            add_hi = hi if add_hi is None else add_hi + hi
        return staged.select(
            F.col("__batch").alias("src"), "osrc", "v",
            (F.col("rmin") + add_lo).alias("rmin"),
            (F.col("rmax") + add_hi).alias("rmax"),
        )

    cur = pts.select(F.col("src"), F.col("src").alias("osrc"), "v", "rmin", "rmax")
    sources = list(range(9))
    while len(sources) > 1:
        cur = column_round(cur, sources, 4).localCheckpoint(eager=False)
        sources = list(range((len(sources) + 3) // 4))
    ref = sorted(
        (r["osrc"], r["v"], r["rmin"], r["rmax"])
        for r in cur.collect()
    )
    assert got == ref


def test_kernel_tree_matches_sql_chain(spark):
    """Round-16 parity pin: gk_tree_compress_local (the vectorized
    Arrow merge+compress kernel) is POINT-FOR-POINT identical to the
    window-SQL chain it replaces — gk_merge_tree(_by_key) +
    gk_compress(_by_key) — across: global and per-key forms, fan_ins
    forcing 1/2/3 rounds, NON-CONTIGUOUS declared sources (dense-rank
    path), sources absent from some keys, duplicate values within a
    source, and out-of-contract srcs (must DROP in both)."""
    import random

    from knovexlite_spark.ops.quantile import (
        gk_build_by_key,
        gk_compress,
        gk_compress_by_key,
        gk_merge_tree,
        gk_merge_tree_by_key,
        gk_tree_compress_local,
    )

    rng = random.Random(20416)
    # per-key build with residue-class sources: 5 keys x 9 declared
    # sources, values with heavy duplication so single sources carry
    # duplicate v points
    rows = [
        (i % 5, rng.randrange(0, 40), rng.randrange(0, 9))
        for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "key long, v long, s long")
    pts = gk_build_by_key(df, "key", "v", k=8, src_col="s")

    for fan_in, srcs in ((16, list(range(9))), (4, list(range(9))), (2, [0, 2, 3, 5, 6, 7, 8])):
        got = sorted(
            map(tuple, gk_tree_compress_local(
                pts, "key", fan_in=fan_in, sources=srcs, k_compress=6
            ).collect())
        )
        ref = sorted(
            map(tuple, gk_compress_by_key(
                gk_merge_tree_by_key(pts, "key", fan_in=fan_in, sources=srcs),
                "key", k=6,
            ).collect())
        )
        assert got == ref, f"per-key mismatch at fan_in={fan_in} srcs={srcs}"

    # global form (no keys), including the single-source degenerate
    gpts = pts.filter(F.col("key") == 0).drop("key")
    for fan_in, srcs in ((3, list(range(9))), (16, [4])):
        got = sorted(
            map(tuple, gk_tree_compress_local(
                gpts, None, fan_in=fan_in, sources=srcs, k_compress=5
            ).collect())
        )
        ref = sorted(
            map(tuple, gk_compress(
                gk_merge_tree(gpts, fan_in=fan_in, sources=srcs),
                k=5,
            ).collect())
        )
        assert got == ref, f"global mismatch at fan_in={fan_in} srcs={srcs}"


def test_gk_summary_local_kernel_vs_sql_paths(spark):
    """The two kernel_merge settings of gk_summary_local(_by_key)
    produce identical summaries on a real build (the partition-id
    source path end to end)."""
    from knovexlite_spark.ops.quantile import (
        gk_summary_local,
        gk_summary_local_by_key,
    )

    df = spark.range(0, 5000, 1, 8).selectExpr(
        "id % 7 AS key", "(id * 2654435761) % 997 AS v"
    )
    a = sorted(map(tuple, gk_summary_local(
        df, "v", k=16, k_compress=8, fan_in=4
    ).collect()))
    b = sorted(map(tuple, gk_summary_local(
        df, "v", k=16, k_compress=8, fan_in=4, kernel_merge=False
    ).collect()))
    assert a == b
    ak = sorted(map(tuple, gk_summary_local_by_key(
        df, "key", "v", k=8, k_compress=6, fan_in=4
    ).collect()))
    bk = sorted(map(tuple, gk_summary_local_by_key(
        df, "key", "v", k=8, k_compress=6, fan_in=4, kernel_merge=False
    ).collect()))
    assert ak == bk


def test_gk_summary_kernel_vs_sql_paths(spark):
    """gk_summary's kernel_merge True/False produce identical
    summaries on BOTH merge routes: the tree (merge_fan_in set) and
    the flat merge (replayed by the kernel as one >=p-fan round)."""
    df = spark.range(0, 6000, 1, 8).selectExpr(
        "(id * 2654435761) % 4093 AS v"
    )
    for fan in (8, None):
        a = sorted(map(tuple, gk_summary(
            df, "v", k_build=32, k_compress=16, num_groups=32,
            merge_fan_in=fan,
        ).collect()))
        b = sorted(map(tuple, gk_summary(
            df, "v", k_build=32, k_compress=16, num_groups=32,
            merge_fan_in=fan, kernel_merge=False,
        ).collect()))
        assert a == b, f"merge_fan_in={fan}"
    # default single-source path (no group knobs)
    a = sorted(map(tuple, gk_summary(df, "v", k_build=16, k_compress=8).collect()))
    b = sorted(map(tuple, gk_summary(
        df, "v", k_build=16, k_compress=8, kernel_merge=False
    ).collect()))
    assert a == b
