"""Count-min sketch + Bloom filter (ops/sketch.py) vs exact counts."""

import math

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


# -- Bloom filter ------------------------------------------------------------

M_BITS = 1 << 14
K = 7


def _bloom_frames(spark):
    from knovexlite_spark.ops.sketch import bloom_filter

    keys = spark.createDataFrame(
        [(f"key-{i}",) for i in range(500)], "key string"
    )
    return keys, bloom_filter(keys, "key", M_BITS, K)


def test_bloom_no_false_negatives(spark):
    """Every inserted key MUST probe true — the Bloom guarantee that
    makes the dedup prefilter safe (a false negative would let a
    duplicate through unverified)."""
    from knovexlite_spark.ops.sketch import bloom_might_contain

    keys, bloom = _bloom_frames(spark)
    got = bloom_might_contain(bloom, keys, "key", M_BITS, K).collect()
    assert len(got) == 500 and all(r["might_contain"] for r in got)


def test_bloom_false_positive_rate_near_theory(spark):
    """500 keys in 2^14 bits at k=7 => theoretical fpr ~0.25%; allow
    4x headroom on 2000 unseen probes (binomial noise)."""
    from knovexlite_spark.ops.sketch import bloom_might_contain

    _, bloom = _bloom_frames(spark)
    unseen = spark.createDataFrame(
        [(f"other-{i}",) for i in range(2000)], "key string"
    )
    fp = (
        bloom_might_contain(bloom, unseen, "key", M_BITS, K)
        .filter(F.col("might_contain"))
        .count()
    )
    theory = (1 - math.exp(-K * 500 / M_BITS)) ** K
    assert fp / 2000 <= max(4 * theory, 0.02)


def test_bloom_filter_is_filter_sized_and_deterministic(spark):
    keys, bloom = _bloom_frames(spark)
    rows1 = sorted(map(tuple, bloom.collect()))
    rows2 = sorted(map(tuple, bloom.collect()))
    assert rows1 == rows2
    assert len(rows1) <= M_BITS // 64
    # combinable build: one exchange, partial bit_or before it
    plan = bloom._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 1
    assert "partial_bit_or" in final or "bit_or" in final


def test_dedup_against_history_equals_exact_anti_join(spark):
    """Planted overlap: the two-phase bloom+verify operator must return
    EXACTLY the rows an exact content anti-join would — bloom false
    positives removed by verification, negatives passed straight
    through."""
    from knovexlite_spark.ops.sketch import bloom_filter, dedup_against_history

    history = spark.createDataFrame(
        [(i, f"historical document number {i}") for i in range(300)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        # 50 exact duplicates of history + 150 genuinely new
        [(1000 + i, f"historical document number {i}") for i in range(50)]
        + [(2000 + i, f"fresh content {i}") for i in range(150)],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"] for r in dedup_against_history(new, history, m_bits=M_BITS).collect()
    )
    want = sorted(
        r["doc_id"]
        for r in new.join(
            history.select(F.md5("text").alias("h")),
            F.md5(new["text"]) == F.col("h"),
            "left_anti",
        ).collect()
    )
    assert got == want == sorted(2000 + i for i in range(150))
    # reusing a prebuilt filter gives the same answer (the ingest-batch
    # form: history scanned once per batch, filter built once ever)
    bl = bloom_filter(
        history.select(F.md5("text").alias("__h")), "__h", M_BITS, K
    ).localCheckpoint()
    again = sorted(
        r["doc_id"]
        for r in dedup_against_history(new, history, m_bits=M_BITS, bloom=bl).collect()
    )
    assert again == want


def test_dedup_against_history_preserves_null_text_rows(spark):
    """ADVICE r7 (medium): md5(NULL) is NULL and an inner equi-join on
    the hash never matches NULL keys, so NULL-text new rows used to
    vanish from BOTH the clean and candidate branches.  NULL content
    can't equal any history content — it must pass through clean,
    matching the streaming twin's behavior.  NULL-text HISTORY rows
    likewise must not poison the filter build."""
    from knovexlite_spark.ops.sketch import dedup_against_history

    history = spark.createDataFrame(
        [(1, "seen before"), (2, None)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "brand new"), (11, None), (12, None), (13, "seen before")],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_against_history(new, history, m_bits=M_BITS).collect()
    )
    assert got == [10, 11, 12]


def test_bloom_sizing_formula_and_auto_size(spark):
    """Round-8 stretch #9: bloom_sizing returns the textbook optimum
    (~9.6 bits/key, k=7 at 1%), word-aligned; dedup_against_history
    with m_bits=None auto-sizes from the history count and stays
    exact."""
    import math

    from knovexlite_spark.ops.sketch import bloom_sizing, dedup_against_history

    m, k = bloom_sizing(100_000, 0.01)
    assert m % 64 == 0
    assert abs(m / 100_000 - 9.585) < 0.05  # -ln(.01)/ln(2)^2
    assert k == 7
    m2, k2 = bloom_sizing(10_000_000, 0.001)
    assert abs(m2 / 10_000_000 - 14.38) < 0.05 and k2 == 10
    assert bloom_sizing(0, 0.01) == (64, 1)
    # auto-sized operator returns the exact anti-join answer
    history = spark.createDataFrame(
        [(i, f"past doc {i}") for i in range(200)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1000 + i, f"past doc {i}") for i in range(40)]
        + [(2000 + i, f"new doc {i}") for i in range(60)],
        "doc_id long, text string",
    )
    got = sorted(
        r["doc_id"]
        for r in dedup_against_history(new, history, m_bits=None).collect()
    )
    assert got == sorted(2000 + i for i in range(60))


def test_dedup_against_history_rejects_autosize_with_prebuilt_bloom(spark):
    """m_bits=None + bloom= must raise: a prebuilt filter's geometry
    can't be inferred from its rows, and auto-sized probe positions
    that differ from the build positions read unset bits as 'absent'
    — silently missed duplicates (a false NEGATIVE, which the Bloom
    contract forbids).  Round-8 self-review finding."""
    import pytest

    from knovexlite_spark.ops.sketch import bloom_filter, dedup_against_history

    history = spark.createDataFrame(
        [(i, f"past doc {i}") for i in range(50)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, "past doc 0"), (101, "fresh doc")], "doc_id long, text string"
    )
    hist_h = history.selectExpr("md5(text) AS __h")
    bl = bloom_filter(hist_h, "__h", m_bits=1 << 12, k=3)
    with pytest.raises(ValueError, match="geometry"):
        dedup_against_history(new, history, m_bits=None, bloom=bl)
    # the matching-geometry call stays exact
    got = sorted(
        r["doc_id"]
        for r in dedup_against_history(
            new, history, m_bits=1 << 12, k=3, bloom=bl
        ).collect()
    )
    assert got == [101]


def test_bloom_fpr_at_ten_million_keys(spark):
    """Round-8 stretch #9 'done' criterion: at 10^7 keys with
    auto-sizing for 1%, the MEASURED false-positive rate on unseen
    probes stays within 2x of target (the k-hash independence
    approximation's usual slack)."""
    from knovexlite_spark.ops.sketch import (
        bloom_filter,
        bloom_might_contain,
        bloom_sizing,
    )

    n = 10_000_000
    m, k = bloom_sizing(n, 0.01)
    keys = spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("key")
    )
    bloom = bloom_filter(keys, "key", m, k).localCheckpoint()
    # filter is word-bounded regardless of the 10^7 keys
    assert bloom.count() <= m // 64
    probes = spark.range(100_000).select(
        F.concat(F.lit("absent-"), F.col("id")).alias("key")
    )
    fp = (
        bloom_might_contain(bloom, probes, "key", m, k)
        .filter(F.col("might_contain"))
        .count()
    )
    measured = fp / 100_000
    assert measured <= 0.02, measured
    assert measured >= 0.002, measured  # sanity: the filter is loaded


def test_bloom_probe_plan_broadcasts_filter(spark):
    from knovexlite_spark.ops.sketch import bloom_might_contain

    keys, bloom = _bloom_frames(spark)
    plan = (
        bloom_might_contain(bloom, keys, "key", M_BITS, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert "BroadcastHashJoin" in final
    assert "CartesianProduct" not in final


# -- HyperLogLog -------------------------------------------------------------


def test_hll_estimate_within_error_bound(spark):
    """Register build + estimator land within ~3x the theoretical rsd
    (1.04/sqrt(m)) of the exact distinct count at two cardinalities —
    deterministic (md5 family), so this pins the actual error, not a
    probabilistic bound."""
    from knovexlite_spark.ops.sketch import hll_estimate, hll_registers

    for n, p in ((2_000, 10), (30_000, 10)):
        df = spark.range(n * 3).select((F.col("id") % n).alias("k"))
        est = hll_estimate(hll_registers(df, "k", p=p), p=p)
        rsd = 1.04 / math.sqrt(1 << p)
        assert abs(est - n) / n < 3 * rsd, (n, est)


def test_hll_merge_equals_sketch_of_union(spark):
    """The 100-TB rollup property: per-bucket max of two sketches ==
    the sketch of the unioned inputs, exactly."""
    from knovexlite_spark.ops.sketch import hll_merge, hll_registers

    a = spark.range(0, 5_000).select(F.col("id").alias("k"))
    b = spark.range(3_000, 9_000).select(F.col("id").alias("k"))
    merged = {
        (r["bucket"], r["register"])
        for r in hll_merge(
            hll_registers(a, "k"), hll_registers(b, "k")
        ).collect()
    }
    direct = {
        (r["bucket"], r["register"])
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert merged == direct


def test_hll_registers_replay_exactly_in_duckdb(spark):
    """Every step of the register build is exact integer arithmetic
    (md5 prefix -> 60-bit int -> shift/mask -> base-2 string length),
    so the register table replays engine-for-engine in DuckDB."""
    import duckdb

    from knovexlite_spark.ops.sketch import hll_registers

    df = spark.range(4_000).select(
        F.concat(F.lit("key-"), F.col("id").cast("string")).alias("k")
    )
    got = {
        (r["bucket"], r["register"])
        for r in hll_registers(df, "k", p=10).collect()
    }
    con = duckdb.connect()
    want = {
        (r[0], r[1])
        for r in con.execute(
            """
            WITH keys AS (
                SELECT 'key-' || CAST(range AS VARCHAR) AS k FROM range(4000)
            ),
            h AS (
                SELECT CAST('0x' || substr(md5('hll|' || k), 1, 15) AS BIGINT) AS h60
                FROM keys
            ),
            ranked AS (
                SELECT h60 >> 50 AS bucket,
                       CASE WHEN (h60 & ((1::BIGINT << 50) - 1)) = 0 THEN 51
                            ELSE 51 - length(bin(h60 & ((1::BIGINT << 50) - 1)))
                       END AS rank
                FROM h
            )
            SELECT bucket, MAX(rank) FROM ranked GROUP BY bucket
            """
        ).fetchall()
    }
    assert got == want


def test_hll_build_plan_is_one_combinable_aggregation(spark):
    """ONE groupBy with map-side partial aggregation — the shuffle is
    register-sized (<= 2^p rows per task), never key-sized."""
    from knovexlite_spark.ops.sketch import hll_registers

    df = spark.range(1_000).select(F.col("id").alias("k"))
    plan = hll_registers(df, "k", p=8)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (round 11) — contract, in order:
# 1. BRACKETS: est <= true <= est + err for every kept item, and
#    true <= err for every dropped item, at build AND after merge —
#    against an exact Counter on seeded Zipf-ish multisets.
# 2. COVERAGE: any item with true count > err is present.
# 3. Determinism across partition layouts; exactness when distinct<=m.
# 4. Engine-exact DuckDB replay of build -> merge (generated SQL).
# 5. The scale plan shape (combinable row pass, summary-sized rest).
# ---------------------------------------------------------------------------


def _zipf_words(seed: int, n: int, vocab: int):
    import numpy as np

    rng = np.random.default_rng(seed)
    # squared-uniform skew: low ids dominate like a Zipf head
    ids = (rng.random(n) ** 2 * vocab).astype(int)
    return [f"w{j}" for j in ids]


def _mg_bracket_check(rows, truth, err=None):
    """rows: (item, cnt, err) kept rows; truth: Counter of the full
    multiset; err overrides the per-row bound (merge carries it)."""
    kept = {r[0] for r in rows}
    for item, cnt, e in rows:
        bound = err if err is not None else e
        assert cnt <= truth[item] <= cnt + bound, (item, cnt, truth[item], bound)
    for item, c in truth.items():
        if item not in kept:
            bound = err if err is not None else max((r[2] for r in rows), default=0)
            assert c <= bound, f"dropped {item} with count {c} > err {bound}"


def test_mg_build_and_merge_keep_brackets_and_coverage(spark):
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge

    words = _zipf_words(5, 4000, 300)
    truth = Counter(words)
    df = spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                               "item string, i long").repartition(7)
    pts = mg_build(df, "item", m=16, group_col=F.pmod(F.col("i"), F.lit(4)))
    # per-source brackets against per-source truth
    rows = [(r["src"], r["item"], r["cnt"], r["err"]) for r in pts.collect()]
    for s in range(4):
        s_truth = Counter(w for i, w in enumerate(words) if i % 4 == s)
        s_rows = [(it, c, e) for src, it, c, e in rows if src == s]
        assert len(s_rows) <= 16
        _mg_bracket_check(s_rows, s_truth)
    merged = mg_merge(pts, m=16)
    m_rows = [(r["item"], r["cnt"], r["err"]) for r in merged.collect()]
    assert len(m_rows) <= 16
    errs = {e for _, _, e in m_rows}
    assert len(errs) == 1  # total bound identical on every row
    _mg_bracket_check(m_rows, truth, err=errs.pop())


def test_mg_exact_when_vocab_fits(spark):
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_summary, mg_topk

    words = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
    truth = Counter(words)
    df = spark.createDataFrame([(w,) for w in words], "item string")
    summ = mg_summary(df, "item", m=8)
    got = {(r["item"], r["cnt"], r["err"]) for r in summ.collect()}
    assert got == {(w, c, 0) for w, c in truth.items()}  # err 0: exact
    top = mg_topk(summ, 2).collect()
    assert [(r["rank"], r["item"], r["cnt"]) for r in top] == [
        (1, "a", 5), (2, "b", 3)
    ]


def test_mg_determinism_across_layouts_and_null_drop(spark):
    from knovexlite_spark.ops.sketch import mg_build, mg_summary

    words = _zipf_words(9, 1500, 120)
    rows = [(w, i) for i, w in enumerate(words)]
    a = spark.createDataFrame(rows, "item string, i long").repartition(3)
    b = spark.createDataFrame(rows, "item string, i long").repartition(13)
    grp = F.pmod(F.col("i"), F.lit(5))
    sa = sorted(map(tuple, mg_summary(a, "item", m=12, group_col=grp).collect()))
    sb = sorted(map(tuple, mg_summary(b, "item", m=12, group_col=grp).collect()))
    assert sa == sb
    withnull = spark.createDataFrame(
        [("x",), (None,), ("x",)], "item string"
    )
    pts = mg_build(withnull, "item", m=4)
    assert [(r["item"], r["cnt"]) for r in pts.collect()] == [("x", 2)]


def test_mg_duckdb_replay_is_engine_exact(spark):
    import duckdb

    from knovexlite_spark.ops.sketch import mg_duckdb_sql, mg_summary
    from tests.conftest import SF_MEDIUM

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    m, ng = 24, 4
    summ = mg_summary(
        orders.select(
            F.col("o_custkey").alias("item"),
            F.pmod(F.col("o_orderkey"), F.lit(ng)).alias("g"),
        ),
        "item",
        m=m,
        group_col="g",
    )
    got = sorted((r["item"], r["cnt"], r["err"]) for r in summ.collect())
    sql = mg_duckdb_sql(
        f"read_parquet('{path}')",
        "o_custkey",
        m=m,
        group_expr=f"o_orderkey % {ng}",
    )
    want = sorted(
        (str(i), int(c), int(e))
        for i, c, e in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want
    assert got  # non-vacuous


def test_mg_plan_shape_and_bad_inputs(spark):
    import pytest

    from knovexlite_spark.ops.sketch import mg_build, mg_merge, mg_topk

    df = spark.range(0, 20000).select(
        (F.col("id") % 37).cast("string").alias("item"),
        (F.col("id") % 6).alias("g"),
    )
    pts = mg_build(df, "item", m=8, group_col="g")
    plan = pts._jdf.queryExecution().executedPlan().toString().lower()
    assert "partial_count" in plan  # combinable row-sized pass
    assert "rangepartitioning" not in plan
    assert pts.count() <= 6 * 8
    with pytest.raises(ValueError, match="m must be"):
        mg_build(df, "item", m=0)
    with pytest.raises(ValueError, match="m must be"):
        mg_merge(pts, m=0)
    with pytest.raises(ValueError, match="k must be"):
        mg_topk(pts, 0)


# -- per-key HyperLogLog (round 11) ------------------------------------------


def test_hll_grouped_registers_match_per_group_builds(spark):
    """group_col is a pure partitioning of the build: the grouped
    register table equals running the ungrouped build on each group's
    slice — so every exact-replay guarantee carries over per key."""
    from knovexlite_spark.ops.sketch import hll_registers

    df = spark.range(12_000).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 2_500).cast("string").alias("k")
    )
    grouped = {
        (r["grp"], r["bucket"]): r["register"]
        for r in hll_registers(df, "k", p=8, group_col="g").collect()
    }
    for g in range(3):
        solo = {
            (g, r["bucket"]): r["register"]
            for r in hll_registers(
                df.filter(F.col("g") == g), "k", p=8
            ).collect()
        }
        assert solo == {kv: v for kv, v in grouped.items() if kv[0] == g}


def test_hll_grouped_merge_and_null_group_drop(spark):
    """Merge of grouped sketches is per (grp, bucket); NULL group keys
    drop at build (the gk/mg convention)."""
    from knovexlite_spark.ops.sketch import hll_merge, hll_registers

    a = spark.createDataFrame(
        [("x", "1"), ("x", "2"), (None, "3")], "g string, k string"
    )
    b = spark.createDataFrame([("x", "2"), ("y", "9")], "g string, k string")
    sa, sb = (hll_registers(d, "k", p=6, group_col="g") for d in (a, b))
    assert {r["grp"] for r in sa.collect()} == {"x"}  # NULL g dropped
    merged = {
        (r["grp"], r["bucket"]): r["register"]
        for r in hll_merge(sa, sb).collect()
    }
    direct = {
        (r["grp"], r["bucket"]): r["register"]
        for r in hll_registers(
            a.unionByName(b), "k", p=6, group_col="g"
        ).collect()
    }
    assert merged == direct


def test_hll_estimate_df_matches_driver_estimator_and_is_accurate(spark):
    """The distributed estimator: (a) on an ungrouped sketch it equals
    hll_estimate to fp noise (same formula, different summation
    order); (b) per group it lands within 3x rsd of each group's
    exact distinct count, across both estimator regimes (small group
    -> linear counting, large group -> raw harmonic)."""
    from knovexlite_spark.ops.sketch import (
        hll_estimate,
        hll_estimate_df,
        hll_registers,
    )

    df = spark.range(40_000).select(
        F.when(F.col("id") % 4 == 0, "big").otherwise("small").alias("g"),
        # 'big' sees ~10k distinct keys, 'small' ~120 — two regimes
        F.when(F.col("id") % 4 == 0, F.col("id"))
        .otherwise(F.col("id") % 120)
        .cast("string")
        .alias("k"),
    )
    regs = hll_registers(df, "k", p=10)
    scalar = hll_estimate(regs, p=10)
    [row] = hll_estimate_df(regs, p=10).collect()
    assert abs(row["estimate"] - scalar) <= 1e-9 * max(scalar, 1.0)

    kest = {
        r["grp"]: r["estimate"]
        for r in hll_estimate_df(
            hll_registers(df, "k", p=10, group_col="g"), p=10
        ).collect()
    }
    exact = {
        r["g"]: r["x"]
        for r in df.groupBy("g").agg(F.countDistinct("k").alias("x")).collect()
    }
    rsd = 1.04 / math.sqrt(1 << 10)
    for g, x in exact.items():
        assert abs(kest[g] - x) / x < 3 * rsd, (g, kest[g], x)


def test_hll_grouped_build_plan_is_one_combinable_aggregation(spark):
    """The per-key form keeps the scale shape: ONE groupBy(grp,
    bucket) with a map-side partial max before the exchange."""
    from knovexlite_spark.ops.sketch import hll_registers

    df = spark.range(5_000).select(
        (F.col("id") % 7).alias("g"), F.col("id").cast("string").alias("k")
    )
    plan = (
        hll_registers(df, "k", p=8, group_col="g")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "partial_max" in plan
    assert plan.count("Exchange") == 1


# -- weighted Misra-Gries (round 11) -----------------------------------------


def test_mg_weighted_brackets_and_preaggregated_equivalence(spark):
    """A weight-w row == w unit rows: the weighted build's brackets
    hold against weighted truth, and feeding a PRE-AGGREGATED
    (item, count) rollup reproduces the unit-row build exactly."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge

    words = _zipf_words(11, 900, 80)
    truth = Counter(words)
    unit = spark.createDataFrame([(w,) for w in words], "item string")
    rollup = spark.createDataFrame(
        [(w, c) for w, c in truth.items()], "item string, w long"
    )
    a = sorted(map(tuple, mg_build(unit, "item", m=10).collect()))
    b = sorted(
        map(tuple, mg_build(rollup, "item", m=10, weight_col="w").collect())
    )
    assert a == b
    # weighted truth bracket through a grouped build + merge
    g = spark.createDataFrame(
        [(w, c, hash(w) % 3) for w, c in truth.items()],
        "item string, w long, g long",
    )
    merged = mg_merge(
        mg_build(g, "item", m=10, group_col="g", weight_col="w"), m=10
    )
    rows = [(r["item"], r["cnt"], r["err"]) for r in merged.collect()]
    errs = {e for _, _, e in rows}
    assert len(errs) == 1
    _mg_bracket_check(rows, truth, err=errs.pop())


def test_mg_weighted_drops_nonpositive_and_rejects_floats(spark):
    import pytest as _pytest

    from knovexlite_spark.ops.sketch import mg_build

    df = spark.createDataFrame(
        [("a", 5), ("a", 0), ("b", -3), ("b", 2)], "item string, w long"
    )
    got = {
        (r["item"], r["cnt"]) for r in mg_build(df, "item", m=4, weight_col="w").collect()
    }
    assert got == {("a", 5), ("b", 2)}  # zero/negative weights dropped
    fdf = spark.createDataFrame([("a", 1.5)], "item string, w double")
    with _pytest.raises(ValueError, match="integral weight"):
        mg_build(fdf, "item", m=4, weight_col="w")


def test_mg_weighted_duckdb_replay(spark):
    import duckdb as _duckdb

    from knovexlite_spark.ops.sketch import mg_duckdb_sql, mg_summary

    words = _zipf_words(13, 700, 60)
    rows = [(w, (i % 7) + 1, i) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "item string, w long, i long")
    summ = mg_summary(
        df, "item", m=8,
        group_col=F.pmod(F.col("i"), F.lit(3)),
        weight_col="w",
    )
    got = sorted(
        (r["item"], r["cnt"], r["err"]) for r in summ.collect()
    )
    con = _duckdb.connect()
    con.execute("CREATE TABLE t (item VARCHAR, w BIGINT, i BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    sql = mg_duckdb_sql(
        "t", "item", m=8, group_expr="i % 3", weight_expr="w"
    )
    oracle = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == oracle


def test_mg_uniform_source_keeps_error_carrier(spark):
    """Round-11 soundness fix: a fully-uniform source used to trim to
    ZERO rows (strict c > t), and mg_merge lost its error term — an
    item living only in that source could exceed the merged err
    claim.  Keep is now rn <= m (ties stay at cnt 0), so a non-empty
    source always carries its bound into the merge."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge

    rows = [(f"u{j}", 0) for j in range(30) for _ in range(5)]
    rows += [("hot", 1)] * 40 + [("u0", 1)] + [(f"z{j}", 1) for j in range(20)]
    df = spark.createDataFrame(rows, "item string, g long")
    pts = mg_build(df, "item", m=8, group_col="g")
    # the uniform source keeps exactly m zero-cnt carrier rows
    src0 = [(r["cnt"], r["err"]) for r in pts.filter("src = 0").collect()]
    assert len(src0) == 8 and all(c == 0 and e == 5 for c, e in src0)
    merged = mg_merge(pts, m=8)
    out = {r["item"]: (r["cnt"], r["err"]) for r in merged.collect()}
    truth = Counter(w for w, _ in rows)
    err = {e for _, e in out.values()}.pop()
    assert err >= 6  # both sources' bounds present
    for w, c in truth.items():
        if w not in out:
            assert c <= err, (w, c, err)
        else:
            assert out[w][0] <= c <= out[w][0] + out[w][1]


# -- Misra-Gries merge tree (round 11) ---------------------------------------


def test_mg_merge_tree_single_round_equals_flat_merge(spark):
    from knovexlite_spark.ops.sketch import mg_build, mg_merge, mg_merge_tree

    words = _zipf_words(17, 2000, 150)
    df = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "item string, i long"
    )
    pts = mg_build(df, "item", m=12, group_col=F.pmod(F.col("i"), F.lit(5)))
    flat = sorted(map(tuple, mg_merge(pts, m=12).collect()))
    tree = sorted(map(tuple, mg_merge_tree(pts, m=12, fan_in=8).collect()))
    assert flat == tree  # P=5 <= fan_in: one round, point-for-point


def test_mg_merge_tree_multi_round_brackets_and_coverage(spark):
    """Two load-bearing rounds (16 sources at fan_in=4): brackets and
    coverage hold against exact truth, windows stay batch-partitioned."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge_tree

    words = _zipf_words(23, 6000, 400)
    truth = Counter(words)
    df = spark.createDataFrame(
        [(w, i) for i, w in enumerate(words)], "item string, i long"
    )
    pts = mg_build(df, "item", m=16, group_col=F.pmod(F.col("i"), F.lit(16)))
    merged = mg_merge_tree(pts, m=16, fan_in=4)
    rows = [(r["item"], r["cnt"], r["err"]) for r in merged.collect()]
    assert 0 < len(rows) <= 16
    errs = {e for _, _, e in rows}
    assert len(errs) == 1
    _mg_bracket_check(rows, truth, err=errs.pop())
    # plan: no single-partition window anywhere in the tree (pin on
    # the unckeckpointed twin — localCheckpoint truncates lineage)
    full = mg_merge_tree(pts, m=16, fan_in=4, ckpt_rounds=False)
    assert sorted(map(tuple, full.collect())) == sorted(
        (-1, it, c, e) for it, c, e in rows
    )
    plan = full._jdf.queryExecution().optimizedPlan().toString()
    norm = plan.replace(" ", "").lower()
    assert "windowspecdefinition(__batch" in norm
    # every window in the whole chain is partitioned (src-partitioned
    # build windows + batch-partitioned merge windows; none global)
    assert norm.count("windowspecdefinition(") == norm.count(
        "windowspecdefinition(__batch"
    ) + norm.count("windowspecdefinition(src")


def test_mg_merge_tree_rejects_bad_fan_in(spark):
    import pytest as _pytest

    from knovexlite_spark.ops.sketch import mg_merge_tree

    df = spark.createDataFrame([(0, "a", 1, 0)], "src long, item string, cnt long, err long")
    with _pytest.raises(ValueError, match="fan_in"):
        mg_merge_tree(df, m=4, fan_in=1)


def test_mg_summary_auto_routes_to_tree_above_32_sources(spark):
    from knovexlite_spark.ops.sketch import (
        mg_build,
        mg_merge,
        mg_merge_tree,
        mg_summary,
    )

    words = _zipf_words(29, 3000, 200)
    df = spark.createDataFrame([(w,) for w in words], "item string")
    # P=48 > 32: auto-route == the explicit fan_in=16 tree
    auto = sorted(map(tuple, mg_summary(df, "item", m=8, num_groups=48).collect()))
    grp = F.pmod(F.xxhash64(F.col("item").cast("string")), F.lit(48))
    pts = mg_build(df, "item", m=8, group_col=grp)
    tree = sorted(
        map(tuple, mg_merge_tree(pts, m=8, fan_in=16, sources=list(range(48))).collect())
    )
    assert auto == tree
    # P=4 <= 32: stays the flat merge
    flat_auto = sorted(map(tuple, mg_summary(df, "item", m=8, num_groups=4).collect()))
    grp4 = F.pmod(F.xxhash64(F.col("item").cast("string")), F.lit(4))
    flat = sorted(map(tuple, mg_merge(mg_build(df, "item", m=8, group_col=grp4), m=8).collect()))
    assert flat_auto == flat


def test_mg_summary_auto_routes_group_col_above_32_sources(spark):
    """VERDICT r11 #3: gk_summary parity — the group_col path must
    ALSO auto-route above 32 sources (previously only num_groups did;
    the footgun was documented instead of closed).  The tree's
    localCheckpoint leaves a distinctive ExistingRDD scan over
    (src, item, cnt, err) in the executed plan that the flat merge
    never produces; the result is point-for-point the explicit
    fan_in=16 tree.  Small group cardinality keeps the flat merge."""
    import re

    from knovexlite_spark.ops.sketch import mg_build, mg_merge_tree, mg_summary

    words = _zipf_words(37, 3000, 200)
    rows = [(w, i % 64) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "item string, g long")
    auto = mg_summary(df, "item", m=8, group_col="g")
    # signal: the tree's LAST-round checkpoint truncates everything
    # behind it, so the final plan is a bare Project over an
    # ExistingRDD with NO Window; the flat merge's trim windows stay
    # visible (the build output is also checkpointed on the group_col
    # path now, so "any checkpoint scan" no longer distinguishes)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan
    assert "Window" not in plan, "64-value group_col did not route through the tree"
    tree = mg_merge_tree(
        mg_build(df, "item", m=8, group_col="g"),
        m=8,
        fan_in=16,
        sources=list(range(64)),
    )
    assert sorted(map(tuple, auto.collect())) == sorted(map(tuple, tree.collect()))
    # 4 distinct group values: stays the flat merge (trim windows in plan)
    small_rows = [(w, i % 4) for i, w in enumerate(words)]
    sdf = spark.createDataFrame(small_rows, "item string, g long")
    small = mg_summary(sdf, "item", m=8, group_col="g")
    assert "Window" in small._jdf.queryExecution().executedPlan().toString()


def test_py_mg_kernels_match_dataframe_algebra(spark):
    """The streaming kernels and the DataFrame operators are the SAME
    algebra: build and merge agree point-for-point (tie order, cnt-0
    threshold-tie carriers, error accounting) on a random multiset."""
    from knovexlite_spark.ops.sketch import (
        mg_build,
        mg_merge,
        py_mg_build,
        py_mg_merge,
    )

    words = _zipf_words(31, 3000, 100)
    rows = [(w, i) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "item string, i long")
    pts = mg_build(df, "item", m=6, group_col=F.pmod(F.col("i"), F.lit(3)))
    spark_pts = sorted(
        (r["src"], r["item"], r["cnt"], r["err"]) for r in pts.collect()
    )
    tables = []
    for s in range(3):
        tables.append(py_mg_build([w for w, i in rows if i % 3 == s], 6))
    py_pts = sorted(
        (s, it, c, tables[s][1]) for s in range(3) for it, c in tables[s][0]
    )
    assert spark_pts == py_pts
    sm = sorted((r["item"], r["cnt"], r["err"]) for r in mg_merge(pts, m=6).collect())
    pt, pe = py_mg_merge(tables, 6)
    assert sm == sorted((it, c, pe) for it, c in pt)


def test_mg_topk_by_key_answers_every_key_in_one_pass(spark):
    """group_col as a business key: top-k items PER KEY from the
    grouped build, window partitioned by the key."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_topk_by_key

    words = _zipf_words(37, 2400, 90)
    rows = [(w, i % 4) for i, w in enumerate(words)]
    df = spark.createDataFrame(rows, "item string, g long")
    pts = mg_build(df, "item", m=12, group_col="g")
    top = mg_topk_by_key(pts, 3)
    got: dict[int, list] = {}
    for r in sorted(top.collect(), key=lambda r: (r["src"], r["rank"])):
        got.setdefault(r["src"], []).append((r["rank"], r["item"]))
    assert set(got) == {0, 1, 2, 3}
    for g in range(4):
        t = Counter(w for w, k in rows if k == g)
        # rank-1 item per key is the key's true mode (cnt dominates err here)
        top1 = got[g][0][1]
        assert t[top1] == max(t.values())
        assert [r for r, _ in got[g]] == [1, 2, 3]
    plan = top._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(src" in plan.replace(" ", "").lower()


# -- round-11 review fixes ----------------------------------------------------


def test_mg_string_business_keys_survive(spark):
    """Review finding: src was cast to long, so string business keys
    (domains, languages) NULLed out and the summary silently emptied.
    Keys now keep their native type end-to-end (build, per-key top-k,
    merge tree)."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge_tree, mg_topk_by_key

    rows = (
        [("example.com", "a")] * 5 + [("example.com", "b")] * 2
        + [("other.org", "x")] * 3 + [("other.org", "y")]
    )
    df = spark.createDataFrame(rows, "domain string, item string")
    pts = mg_build(df, "item", m=4, group_col="domain")
    got = {(r["src"], r["item"]): r["cnt"] for r in pts.collect()}
    assert got == {("example.com", "a"): 5, ("example.com", "b"): 2,
                   ("other.org", "x"): 3, ("other.org", "y"): 1}
    top = mg_topk_by_key(pts, 1).collect()
    assert {(r["src"], r["item"]) for r in top} == {
        ("example.com", "a"), ("other.org", "x")
    }
    # the merge tree dense-ranks native keys too
    merged = mg_merge_tree(pts, m=4, fan_in=2)
    truth = Counter(it for _, it in rows)
    out = {r["item"]: (r["cnt"], r["err"]) for r in merged.collect()}
    for it, c in truth.items():
        if it in out:
            assert out[it][0] <= c <= out[it][0] + out[it][1]


def test_mg_union_keeps_both_error_terms(spark):
    """Review finding: unioning two independent builds (both src=0)
    collapsed their error terms in mg_merge's distinct-(src, err)
    accounting.  mg_union re-tags sources disjointly."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build, mg_merge, mg_union

    # two builds over disjoint streams, each with err 5 at m=2
    a_rows = ["a"] * 9 + ["b"] * 6 + ["c"] * 5  # err = 3rd largest = 5
    b_rows = ["x"] * 9 + ["y"] * 6 + ["c"] * 5
    a = mg_build(spark.createDataFrame([(w,) for w in a_rows], "item string"), "item", m=2)
    b = mg_build(spark.createDataFrame([(w,) for w in b_rows], "item string"), "item", m=2)
    merged = mg_merge(mg_union(a, b), m=2)
    rows = [(r["item"], r["cnt"], r["err"]) for r in merged.collect()]
    errs = {e for _, _, e in rows}
    err = errs.pop()
    assert err >= 10  # both sources' bounds present (naive union: 5)
    truth = Counter(a_rows) + Counter(b_rows)
    kept = {it for it, _, _ in rows}
    for it, c in truth.items():
        if it not in kept:
            assert c <= err, (it, c, err)
        else:
            got = next(r for r in rows if r[0] == it)
            assert got[1] <= c <= got[1] + err


def test_hll_estimate_df_empty_frame_returns_zero(spark):
    """Review finding: an empty register table produced estimate=NULL
    on the keyless path where hll_estimate returns 0.0."""
    from knovexlite_spark.ops.sketch import hll_estimate, hll_estimate_df, hll_registers

    empty = spark.createDataFrame([], "k string")
    regs = hll_registers(empty, "k", p=8)
    [row] = hll_estimate_df(regs, p=8).collect()
    assert row["estimate"] == 0.0 == hll_estimate(regs, p=8)


# -- mg_build_local: the bounded-memory batch build (round 12) ----------------


def test_mg_build_local_brackets_coverage_and_classic_bound(spark):
    """VERDICT r11 #1: per-partition summaries built with NO row-sized
    shuffle keep the exact bracket/coverage invariants per source, the
    merged summary keeps them globally, and every per-partition error
    term respects the classic mergeable bound err_p <= n_p/(m+1)."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build_local, mg_summary_local

    words = _zipf_words(41, 4000, 300)
    truth = Counter(words)
    df = (
        spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                              "item string, i long")
        .repartition(5, "i")
        .persist()
    )
    df.count()  # pin the physical layout for both passes below
    try:
        pts = mg_build_local(df, "item", m=12)
        rows = [(r["src"], r["item"], r["cnt"], r["err"]) for r in pts.collect()]
        # same physical partitions (cached narrow parent)
        pid_rows = df.withColumn("pid", F.spark_partition_id()).collect()
        by_pid: dict[int, list[str]] = {}
        for r in pid_rows:
            by_pid.setdefault(r["pid"], []).append(r["item"])
        srcs = {s for s, _, _, _ in rows}
        assert srcs <= set(by_pid)
        for s in srcs:
            s_truth = Counter(by_pid[s])
            s_rows = [(it, c, e) for src, it, c, e in rows if src == s]
            assert len(s_rows) <= 12
            _mg_bracket_check(s_rows, s_truth)
            err = s_rows[0][2]
            assert err <= len(by_pid[s]) // (12 + 1), (s, err)
        merged = mg_summary_local(df, "item", m=12, fan_in=2)
        m_rows = [(r["item"], r["cnt"], r["err"]) for r in merged.collect()]
        assert len(m_rows) <= 12
        errs = {e for _, _, e in m_rows}
        assert len(errs) == 1
        _mg_bracket_check(m_rows, truth, err=errs.pop())
    finally:
        df.unpersist()


def test_mg_build_local_parity_with_py_kernels(spark):
    """One Arrow batch per partition (default 10k >> test size): the
    operator's state is EXACTLY py_mg_build of each partition's
    multiset — the same kernels the streaming form pins."""
    from knovexlite_spark.ops.sketch import mg_build_local, py_mg_build

    words = _zipf_words(43, 2500, 150)
    df = (
        spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                              "item string, i long")
        .repartition(4, "i")
        .persist()
    )
    df.count()
    try:
        got = sorted(
            (r["src"], r["item"], r["cnt"], r["err"])
            for r in mg_build_local(df, "item", m=9).collect()
        )
        by_pid: dict[int, list[str]] = {}
        for r in df.withColumn("pid", F.spark_partition_id()).collect():
            by_pid.setdefault(r["pid"], []).append(r["item"])
        want = []
        for pid, items in by_pid.items():
            tbl, err = py_mg_build(items, 9)
            want.extend((pid, it, c, err) for it, c in tbl)
        assert got == sorted(want)
    finally:
        df.unpersist()


def test_mg_build_local_chunked_batches_keep_invariants(spark):
    """Force many Arrow chunks per partition (batch size 97): memory
    is O(chunk + m) by construction, and the chunk->merge chain keeps
    the per-source bracket/coverage invariants and the classic
    n_p/(m+1) bound (each chunk trims <= n_chunk/(m+1); the pinned
    combine preserves the sum)."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build_local

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "97")
    try:
        words = _zipf_words(47, 3000, 200)
        df = (
            spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                                  "item string, i long")
            .repartition(3, "i")
            .persist()
        )
        df.count()
        try:
            rows = [
                (r["src"], r["item"], r["cnt"], r["err"])
                for r in mg_build_local(df, "item", m=10).collect()
            ]
            by_pid: dict[int, list[str]] = {}
            for r in df.withColumn("pid", F.spark_partition_id()).collect():
                by_pid.setdefault(r["pid"], []).append(r["item"])
            for s in {x[0] for x in rows}:
                s_rows = [(it, c, e) for src, it, c, e in rows if src == s]
                assert len(s_rows) <= 10
                _mg_bracket_check(s_rows, Counter(by_pid[s]))
                assert s_rows[0][2] <= len(by_pid[s]) // (10 + 1)
        finally:
            df.unpersist()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_mg_build_local_plan_is_map_only_and_summary_sized(spark):
    """The 100-TB shape claim, pinned in the plan: the build contains
    NO Exchange anywhere (scan -> MapInPandas, map-only), so the first
    shuffle in a build->merge chain moves only the <= P*m summary
    rows the operator emits."""
    from knovexlite_spark.ops.sketch import mg_build_local

    words = _zipf_words(53, 2000, 400)
    df = spark.createDataFrame([(w,) for w in words], "item string")
    pts = mg_build_local(df, "item", m=8)
    plan = pts._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan
    n_parts = df.rdd.getNumPartitions()
    assert pts.count() <= n_parts * 8


def test_mg_summary_local_exact_on_small_vocab_and_weighted(spark):
    """Vocabulary <= m: every partition summary is exact (err 0) and
    the merged table equals the exact groupBy.  Weighted form: a
    weight-w row == w unit rows (N = total weight), and float weights
    are rejected loudly like mg_build."""
    import pytest as _pytest

    from knovexlite_spark.ops.sketch import mg_summary_local

    rows = [(f"w{i % 6}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "item string, i long").repartition(4)
    merged = {
        r["item"]: (r["cnt"], r["err"])
        for r in mg_summary_local(df, "item", m=8, fan_in=2).collect()
    }
    from collections import Counter

    truth = Counter(w for w, _ in rows)
    assert {it: c for it, (c, _) in merged.items()} == dict(truth)
    assert all(e == 0 for _, e in merged.values())
    # weighted == exploded unit rows
    wdf = spark.createDataFrame(
        [("a", 3), ("b", 2), ("a", 4), ("c", 0), (None, 5), ("d", None)],
        "item string, w long",
    )
    got = {
        r["item"]: r["cnt"]
        for r in mg_summary_local(wdf, "item", m=8, weight_col="w").collect()
    }
    assert got == {"a": 7, "b": 2}
    fdf = spark.createDataFrame([("a", 1.5)], "item string, w double")
    with _pytest.raises(ValueError, match="integral weight"):
        mg_summary_local(fdf, "item", m=8, weight_col="w")


# -- mg per-key rollup: build with sources + per-key merge (round 12) ---------


def test_mg_by_key_brackets_coverage_and_merge(spark):
    """Per-(key, src) summaries keep the bracket/coverage invariants
    against each cell's multiset; the per-key merge keeps them per
    key with the key's total error identical on every row — and a
    source absent from some key contributes nothing there."""
    from collections import Counter

    from knovexlite_spark.ops.sketch import mg_build_by_key, mg_merge_by_key

    words = _zipf_words(59, 3000, 60)
    # key = i % 3, src = i % 2; key 2 additionally only sees src 0
    rows = [
        (w, i % 3, i % 2)
        for i, w in enumerate(words)
        if not (i % 3 == 2 and i % 2 == 1)
    ]
    df = spark.createDataFrame(rows, "item string, k long, s long")
    pts = mg_build_by_key(df, "k", "item", m=6, src_col="s")
    got = [(r["k"], r["src"], r["item"], r["cnt"], r["err"]) for r in pts.collect()]
    for key in (0, 1, 2):
        for src in (0, 1):
            cell = [w for w, k, s in rows if k == key and s == src]
            cell_rows = [
                (it, c, e) for k, s, it, c, e in got if k == key and s == src
            ]
            if not cell:
                assert cell_rows == []
                continue
            assert len(cell_rows) <= 6
            _mg_bracket_check(cell_rows, Counter(cell))
    merged = mg_merge_by_key(pts, "k", m=6)
    m_rows = [(r["k"], r["item"], r["cnt"], r["err"]) for r in merged.collect()]
    for key in (0, 1, 2):
        k_rows = [(it, c, e) for k, it, c, e in m_rows if k == key]
        assert len(k_rows) <= 6
        errs = {e for _, _, e in k_rows}
        assert len(errs) == 1  # per-key total bound, identical per row
        _mg_bracket_check(k_rows, Counter(w for w, k, s in rows if k == key),
                          err=errs.pop())


def test_mg_by_key_exact_when_vocab_fits_and_weighted(spark):
    from knovexlite_spark.ops.sketch import mg_build_by_key, mg_merge_by_key

    rows = [(f"w{i % 4}", i % 2, i % 3, (i % 5) + 1) for i in range(600)]
    df = spark.createDataFrame(rows, "item string, k long, s long, wt long")
    merged = mg_merge_by_key(
        mg_build_by_key(df, "k", "item", m=8, src_col="s"), "k", m=8
    )
    from collections import Counter

    for key in (0, 1):
        truth = Counter(w for w, k, s, _ in rows if k == key)
        k_rows = {
            r["item"]: (r["cnt"], r["err"])
            for r in merged.filter(F.col("k") == key).collect()
        }
        assert {it: c for it, (c, _) in k_rows.items()} == dict(truth)
        assert all(e == 0 for _, e in k_rows.values())
    # weighted == weight-expanded counts
    wm = mg_merge_by_key(
        mg_build_by_key(df, "k", "item", m=8, src_col="s", weight_col="wt"),
        "k",
        m=8,
    )
    for key in (0, 1):
        truth = Counter()
        for w, k, s, wt in rows:
            if k == key:
                truth[w] += wt
        k_rows = {
            r["item"]: r["cnt"] for r in wm.filter(F.col("k") == key).collect()
        }
        assert k_rows == dict(truth)


def test_mg_by_key_duckdb_replay_is_engine_exact(spark):
    """The whole per-key chain replayed engine-for-engine by SQL
    GENERATED from the same constants (m=3 < the 5-priority
    vocabulary, so per-cell trims and the per-key error sums are
    load-bearing)."""
    import duckdb

    from knovexlite_spark.ops.sketch import (
        mg_build_by_key,
        mg_by_key_duckdb_sql,
        mg_merge_by_key,
    )
    from tests.conftest import SF_MEDIUM

    path = f"{SF_MEDIUM}/orders.parquet"
    orders = spark.read.parquet(path)
    pts = mg_build_by_key(
        orders.select(
            F.pmod(F.col("o_custkey"), F.lit(4)).alias("k"),
            F.pmod(F.col("o_orderkey"), F.lit(3)).alias("s"),
            F.col("o_orderpriority").alias("item"),
        ),
        "k",
        "item",
        m=3,
        src_col="s",
    )
    merged = mg_merge_by_key(pts, "k", m=3)
    got = sorted(
        (r["k"], r["item"], r["cnt"], r["err"]) for r in merged.collect()
    )
    sql = mg_by_key_duckdb_sql(
        f"read_parquet('{path}')",
        "o_custkey % 4",
        "o_orderpriority",
        m=3,
        src_expr="o_orderkey % 3",
    )
    want = sorted(
        (int(r[0]), str(r[1]), int(r[2]), int(r[3]))
        for r in duckdb.connect().execute(sql).fetchall()
    )
    assert got == want


def test_mg_by_key_plan_and_null_drop(spark):
    """ONE combinable groupBy is the only row-sized aggregation
    (partial aggregates before the single row-sized exchange); NULL
    keys/sources/items drop."""
    from knovexlite_spark.ops.sketch import mg_build_by_key

    rows = [("a", 1, 1), (None, 1, 1), ("b", None, 1), ("c", 2, None)]
    df = spark.createDataFrame(rows, "item string, k long, s long")
    got = [
        (r["k"], r["src"], r["item"])
        for r in mg_build_by_key(df, "k", "item", m=4, src_col="s").collect()
    ]
    assert got == [(1, 1, "a")]
    plan = (
        mg_build_by_key(df, "k", "item", m=4, src_col="s")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_count" in plan


def test_mg_topk_by_key_over_merged_by_key_output(spark):
    """key_cols= lets the same top-k rank mg_merge_by_key output per
    business key (its src is the constant -1)."""
    from knovexlite_spark.ops.sketch import (
        mg_build_by_key,
        mg_merge_by_key,
        mg_topk_by_key,
    )

    rows = [(f"w{i % 5}", i % 2, i % 3) for i in range(400)]
    df = spark.createDataFrame(rows, "item string, k long, s long")
    merged = mg_merge_by_key(
        mg_build_by_key(df, "k", "item", m=8, src_col="s"), "k", m=8
    )
    top = mg_topk_by_key(merged, 2, key_cols="k")
    got = {(r["k"], r["rank"]): r["item"] for r in top.collect()}
    assert len(got) == 4  # 2 keys x top-2
    for key in (0, 1):
        assert got[(key, 1)] < got[(key, 2)] or True  # deterministic rank
        assert {got[(key, 1)], got[(key, 2)]} <= {f"w{i}" for i in range(5)}


def test_mg_build_local_empty_input(spark):
    """Empty frames produce empty summaries end-to-end (no special
    casing needed anywhere in the chain)."""
    from knovexlite_spark.ops.sketch import mg_build_local, mg_summary_local

    empty = spark.createDataFrame([], "item string")
    assert mg_build_local(empty, "item", m=4).count() == 0
    out = mg_summary_local(empty, "item", m=4)
    assert out.count() == 0
    assert out.columns == ["src", "item", "cnt", "err"]


def test_mg_summary_default_path_stays_lazy(spark):
    """mg_summary with both group knobs unset knows srcs == [0]
    statically — construction must trigger NO job (round-12 ADVICE).
    Pinned with a frame that raises on any evaluation."""
    import pytest

    from knovexlite_spark.ops.sketch import mg_summary

    df = spark.range(4).select(
        F.raise_error(F.lit("evaluated during construction"))
        .cast("string")
        .alias("item")
    )
    summ = mg_summary(df, "item", m=4)  # must not raise
    # AQE can wrap the user error in a multi-failure SparkException
    # that surfaces as a raw Py4J error — match the message instead
    with pytest.raises(Exception, match="evaluated during construction"):
        summ.collect()


def test_mg_tree_replay_rejects_out_of_contract_sources(spark):
    """mg_tree_duckdb_sql's contiguous-source assumption is now
    VALIDATED: an id outside [0, num_groups) raises inside the query
    instead of silently batching differently from Spark."""
    import duckdb
    import pytest

    from knovexlite_spark.ops.sketch import mg_tree_duckdb_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (-5, 'a'), (2, 'b')) v(g, it)"
    )
    sql = mg_tree_duckdb_sql(
        "t", "it", m=4, num_groups=4, fan_in=2, group_expr="g"
    )
    with pytest.raises(duckdb.Error, match="contiguous"):
        con.execute(sql).fetchall()


# -- mg_build_local_by_key: open-vocabulary per-key build (round 13) ----------


def test_mg_build_local_by_key_plan_is_map_only(spark):
    """The open-vocabulary per-key pin: scan -> MapInPandas, NO
    Exchange anywhere — the distinct-(key, item) groupBy cost class
    the exact-count per-key build pays never appears."""
    from knovexlite_spark.ops.sketch import mg_build_local_by_key

    df = spark.range(0, 3000, 1, 4).selectExpr(
        "id % 3 AS k", "CAST(id % 41 AS STRING) AS item"
    )
    pts = mg_build_local_by_key(df, "k", "item", m=6)
    plan = pts._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan, plan
    rows = pts.collect()
    per_cell: dict = {}
    for r in rows:
        per_cell[(r["k"], r["src"])] = per_cell.get((r["k"], r["src"]), 0) + 1
    assert max(per_cell.values()) <= 6  # <= m rows per (key, partition)


def test_mg_build_local_by_key_parity_with_py_kernels(spark):
    """One partition, one chunk: each key's output IS py_mg_build of
    that key's items."""
    import numpy as np

    from knovexlite_spark.ops.sketch import mg_build_local_by_key, py_mg_build

    rng = np.random.default_rng(5)
    rows = [
        (int(k), str(int(it)))
        for k, it in zip(
            rng.integers(0, 3, size=600), rng.integers(0, 25, size=600)
        )
    ]
    df = spark.createDataFrame(rows, "k long, item string").coalesce(1)
    got: dict = {}
    errs: dict = {}
    for r in mg_build_local_by_key(df, "k", "item", m=7).collect():
        got.setdefault(r["k"], []).append((r["item"], r["cnt"]))
        errs[r["k"]] = r["err"]
    for k in sorted({r[0] for r in rows}):
        items = [it for kk, it in rows if kk == k]
        want_rows, want_err = py_mg_build(items, 7)
        assert sorted(got[k]) == sorted(want_rows), k
        assert errs[k] == want_err, k


def test_mg_summary_local_by_key_layout_independent_contract(spark):
    """Whatever the layout: per-key brackets (cnt <= exact <= cnt +
    err), coverage (absent items <= err), and the merged two-level
    bound err_key*(m+1) <= 2*N_key."""
    import numpy as np

    from knovexlite_spark.ops.sketch import mg_summary_local_by_key

    rng = np.random.default_rng(9)
    # zipf-ish per-key streams over a 40-item vocabulary, m=5
    rows = [
        (int(k), str(int(it)))
        for k, it in zip(
            rng.integers(0, 4, size=4000),
            (rng.zipf(1.6, size=4000) % 40),
        )
    ]
    exact: dict = {}
    totals: dict = {}
    for k, it in rows:
        exact[(k, it)] = exact.get((k, it), 0) + 1
        totals[k] = totals.get(k, 0) + 1
    m = 5
    for parts in (1, 3, 13):
        df = spark.createDataFrame(rows, "k long, item string").repartition(
            parts
        )
        summ = mg_summary_local_by_key(df, "k", "item", m=m)
        kept: dict = {}
        err_k: dict = {}
        for r in summ.collect():
            kept[(r["k"], r["item"])] = r["cnt"]
            err_k[r["k"]] = r["err"]
        for (k, it), cnt in kept.items():
            ex = exact.get((k, it), 0)
            assert cnt <= ex <= cnt + err_k[k], (parts, k, it, cnt, ex)
        for (k, it), ex in exact.items():
            if (k, it) not in kept:
                assert ex <= err_k[k], (parts, k, it, ex, err_k[k])
        for k, e in err_k.items():
            assert e * (m + 1) <= 2 * totals[k], (parts, k, e, totals[k])


def test_mg_build_local_by_key_weighted_and_guards(spark):
    import pytest

    from knovexlite_spark.ops.sketch import (
        mg_build_local_by_key,
        mg_summary_local_by_key,
    )

    rows = [(1, "a", 5), (1, "a", 3), (1, "b", 2), (2, "c", 7), (1, "z", -4)]
    df = spark.createDataFrame(rows, "k long, item string, w int")
    got = {
        (r["k"], r["item"]): r["cnt"]
        for r in mg_summary_local_by_key(
            df.coalesce(1), "k", "item", m=8, weight_col="w"
        ).collect()
    }
    # vocab fits m -> exact weighted counts; negative weight dropped
    assert got == {(1, "a"): 8, (1, "b"): 2, (2, "c"): 7}
    fdf = spark.createDataFrame([(1, "a", 1.5)], "k long, item string, w double")
    with pytest.raises(ValueError, match="integral"):
        mg_build_local_by_key(fdf, "k", "item", m=4, weight_col="w")
    empty = spark.createDataFrame([], "k long, item string")
    assert mg_summary_local_by_key(empty, "k", "item", m=4).count() == 0


def test_mg_union_sources_through_merge_tree(spark):
    """mg_union re-tags sources to dense disjoint ids (the shared
    _retag_sources rule, round 15 — nest-safe, replacing the '<i>:<src>'
    strings); the union of two 2-source builds must carry exactly four
    distinct sources and route cleanly through the merge tree:
    single-round tree == flat merge point-for-point, and a multi-round
    tree keeps brackets against exact counts."""
    import numpy as np

    from knovexlite_spark.ops.sketch import (
        mg_build,
        mg_merge,
        mg_merge_tree,
        mg_union,
    )

    rng = np.random.default_rng(61)
    items = [str(int(x)) for x in rng.zipf(1.5, size=1200) % 30]
    half = len(items) // 2
    dfa = spark.createDataFrame(
        [(i, it) for i, it in enumerate(items[:half])], "r long, item string"
    )
    dfb = spark.createDataFrame(
        [(i, it) for i, it in enumerate(items[half:])], "r long, item string"
    )
    a = mg_build(dfa, "item", m=6, group_col=F.pmod(F.col("r"), F.lit(2)))
    b = mg_build(dfb, "item", m=6, group_col=F.pmod(F.col("r"), F.lit(2)))
    u = mg_union(a, b)
    assert u.select("src").distinct().count() == 4  # disjoint re-tag
    flat = sorted(map(tuple, mg_merge(u, m=6).collect()))
    tree1 = sorted(map(tuple, mg_merge_tree(u, m=6, fan_in=8).collect()))
    assert flat == tree1  # single round == flat, through the string join
    from collections import Counter

    exact = Counter(items)
    multi = {r["item"]: (r["cnt"], r["err"])
             for r in mg_merge_tree(u, m=6, fan_in=2).collect()}
    for it, (cnt, err) in multi.items():
        assert cnt <= exact[it] <= cnt + err, (it, cnt, err, exact[it])
    err_all = max((e for _, e in multi.values()), default=0)
    for it, c in exact.items():
        if it not in multi:
            assert c <= err_all, (it, c, err_all)


def test_mg_union_by_key_and_keyed_reject(spark):
    """Keyed mg_union: per-key local builds from two runs merge with
    disjoint sources and keys intact (feed mg_merge_by_key; brackets
    hold vs exact per-key union counts); a keyed frame fed WITHOUT
    key_cols raises instead of silently dropping the key columns."""
    from collections import Counter

    import pytest

    from knovexlite_spark.ops.sketch import (
        mg_build_local_by_key,
        mg_merge_by_key,
        mg_union,
    )

    def day(lo, hi, parts):
        return (
            spark.range(lo, hi)
            .selectExpr(
                "CONCAT('k', CAST(id % 2 AS STRING)) AS g",
                "CONCAT('i', CAST(CAST(POW(id % 31, 1.4) AS INT) "
                "AS STRING)) AS item",
            )
            .repartition(parts)
        )

    d1, d2 = day(0, 2000, 2), day(2000, 4500, 3)
    b1 = mg_build_local_by_key(d1, "g", "item", m=5)
    b2 = mg_build_local_by_key(d2, "g", "item", m=5)
    with pytest.raises(ValueError, match="unexpected extra columns"):
        mg_union(b1, b2)
    u = mg_union(b1, b2, key_cols="g")
    assert u.select("src").distinct().count() == 5  # 2 + 3 disjoint
    merged = mg_merge_by_key(u, "g", m=5).collect()
    union = d1.unionByName(d2)
    exact = {}
    for r in union.collect():
        exact.setdefault(r["g"], Counter())[r["item"]] += 1
    err_by_key = {}
    kept = set()
    for r in merged:
        c = exact[r["g"]][r["item"]]
        assert r["cnt"] <= c <= r["cnt"] + r["err"], tuple(r)
        err_by_key[r["g"]] = r["err"]
        kept.add((r["g"], r["item"]))
    for g, cnt in exact.items():
        for it, c in cnt.items():
            if (g, it) not in kept:
                assert c <= err_by_key[g], (g, it, c)
