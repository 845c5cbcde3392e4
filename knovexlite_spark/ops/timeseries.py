"""Time-bucket resample + gap fill — the hypertable-style rollup tier.

The missing piece between the event queries (q18 tumbling window, q19
sessionization) and real time-series analytics: downsample an event
stream to fixed buckets PER KEY and then make the series DENSE —
every key gets a row for every bucket between its first and last
observation, with counts zero-filled and carried metrics
forward-filled (LOCF).  The reference engine (a torch KG reasoner,
/root/reference/knovex) has no time-series surface; this tier serves
the analytics/pipeline side of the repo.

Everything is exact-integer where it can be: buckets are stride-
aligned LONG MICROSECONDS (floor via pmod, so pre-epoch timestamps
bucket correctly), the spine is an integer `sequence`, and the whole
chain replays engine-for-engine in DuckDB (`resample_duckdb_sql`
generates the twin: epoch_us // stride, generate_series, LAST_VALUE
... IGNORE NULLS).

Scale shape (the 100-TB contract):
- `resample` is ONE combinable groupBy(key, bucket) — map-side
  partials cap each task's shuffle at its distinct (key, bucket)
  pairs, exactly the gk/mg discipline.
- the `gap_fill` spine is generated per key from its (min, max)
  bucket — a summary-sized frame — and exploded in TWO LEVELS
  (chunks of `_CHUNK` buckets, then buckets within the chunk) so a
  single key spanning years at second stride never materializes a
  multi-million-element array in one row.
- the fill window partitions by key: one hash exchange fans a
  million keys across the cluster, each key fills locally.
- the aggregated frame is localCheckpointed (lazy) before fanning
  into spine bounds + join probe: without the barrier Catalyst
  inlines its lineage into both branches = two full raw scans.
- footgun documented: spine size is span/stride PER KEY.  A key
  observed across 3 years at 1 s stride emits ~95 M rows by design —
  that is what "dense" means; choose the stride for the span.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# two-level explode chunk size: caps any single generated array at
# this many elements regardless of key span / stride
_CHUNK = 4096

_US = {"s": 1_000_000, "m": 60_000_000, "h": 3_600_000_000, "d": 86_400_000_000}


def stride_us(spec: int | str) -> int:
    """Normalize a stride to long microseconds: an int passes through
    (already micros); strings take '<n><unit>' with unit in s/m/h/d
    ('15m', '1h', '7d')."""
    if isinstance(spec, int):
        us = spec
    else:
        unit = spec[-1]
        if unit not in _US:
            raise ValueError(f"stride unit must be one of s/m/h/d, got {spec!r}")
        us = int(spec[:-1]) * _US[unit]
    if us <= 0:
        raise ValueError(f"stride must be positive, got {spec!r}")
    return us


def time_bucket(ts: Column | str, stride: int | str) -> Column:
    """Floor a timestamp column to a stride-aligned bucket, as LONG
    MICROSECONDS.  pmod (not %) keeps the floor correct for pre-epoch
    timestamps: -1 us at 1 h stride buckets to -3600000000, not 0."""
    s = stride_us(stride)
    u = F.unix_micros(F.col(ts) if isinstance(ts, str) else ts)
    return (u - F.pmod(u, F.lit(s))).cast("long")


def resample(
    df: DataFrame,
    ts_col: str,
    stride: int | str,
    key_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    bucket_col: str = "bucket_us",
) -> DataFrame:
    """Downsample to fixed time buckets per key: ONE combinable
    groupBy(key..., bucket).  ``aggs`` are ordinary aggregate Columns
    (count/sum/avg/...); default is COUNT(*) AS n.  NULL timestamps
    and NULL keys drop (the repo's sketch convention — SQL GROUP BY
    would keep a NULL group; a time series for "no time" is
    meaningless).  Output bucket is long micros; render with
    F.timestamp_micros when a timestamp is wanted."""
    keys = list(key_cols or [])
    if aggs is None:
        aggs = [F.count(F.lit(1)).alias("n")]
    out = df.filter(F.col(ts_col).isNotNull())
    for k in keys:
        out = out.filter(F.col(k).isNotNull())
    return out.withColumn(bucket_col, time_bucket(ts_col, stride)).groupBy(
        *keys, bucket_col
    ).agg(*aggs)


def _spine(
    agg: DataFrame, keys: list[str], bucket_col: str, s: int
) -> DataFrame:
    """Dense (key..., bucket) spine from each key's [min, max] bucket
    range.  Two-level explode: chunk starts first (sequence step
    s*_CHUNK), then buckets within the chunk — no generated array
    exceeds _CHUNK elements however wide the span."""
    bounds = agg.groupBy(*keys).agg(
        F.min(bucket_col).alias("__mn"),
        F.max(bucket_col).alias("__mx"),
        F.max(F.pmod(bucket_col, F.lit(s))).alias("__mis"),
    )
    # loud edge: a stride that does not divide EVERY bucket value
    # would make the spine miss aggregated buckets (min/max alone is
    # not enough: 1 h buckets gap-filled at 2 h have aligned bounds
    # but the odd hours silently vanish — round-11 review finding).
    # time_bucket aligns buckets to the epoch, so pmod(bucket, stride)
    # == 0 must hold for all; max(pmod) rides the bounds aggregation.
    mn_checked = F.when(F.col("__mis") == 0, F.col("__mn")).otherwise(
        F.raise_error(
            F.lit(
                "gap_fill: bucket values are not aligned to the stride — "
                "pass the SAME stride the buckets were built with"
            )
        ).cast("long")
    )
    chunk = s * _CHUNK
    starts = bounds.select(
        *keys,
        F.col("__mx").alias("__mx2"),
        F.explode(
            F.sequence(mn_checked, F.col("__mx"), F.lit(chunk))
        ).alias("__cs"),
    )
    return starts.select(
        *keys,
        F.explode(
            F.sequence(
                F.col("__cs"),
                F.least(F.col("__cs") + F.lit(chunk - s), F.col("__mx2")),
                F.lit(s),
            )
        ).alias(bucket_col),
    )


def gap_fill(
    agg: DataFrame,
    stride: int | str,
    key_cols: list[str] | None = None,
    fill: dict[str, str | None] | None = None,
    bucket_col: str = "bucket_us",
    materialize: bool = True,
) -> DataFrame:
    """Densify a resampled frame: one row per key per stride-aligned
    bucket between that key's first and last observation.  ``fill``
    maps each value column to 'zero' (absent bucket -> 0 — counts),
    'ffill' (carry the last observed value forward — gauges/LOCF),
    'interp' (LINEAR interpolation between the two enclosing
    observations, as double; leading/trailing gaps stay NULL — there
    is nothing to interpolate toward; combine with ffill semantics by
    choosing ffill instead), or None (leave NULL).  Unlisted value
    columns default to None.

    The ffill window partitions by key and orders by bucket with a
    rows frame (unbounded..current): buckets are distinct post-
    groupBy, so rows == range, and each key fills locally after one
    hash exchange.  Leading buckets before a key's first observation
    of a column stay NULL under 'ffill' (nothing to carry).

    ``materialize`` (default True) localCheckpoints ``agg`` lazily:
    the aggregated frame feeds BOTH the spine bounds and the join
    probe, and without a materialization barrier Catalyst inlines its
    lineage into both branches — at corpus scale that is TWO full
    raw-table scans for one rollup.  Pass False only when ``agg`` is
    already a materialized/cached table."""
    keys = list(key_cols or [])
    s = stride_us(stride)
    fill = dict(fill or {})
    vals = [c for c in agg.columns if c != bucket_col and c not in keys]
    bad = sorted(set(fill) - set(vals))
    if bad:
        raise ValueError(f"fill names unknown value columns: {bad}")
    bad_modes = {
        c: m for c, m in fill.items()
        if m not in ("zero", "ffill", "interp", None)
    }
    if bad_modes:
        raise ValueError(
            f"fill modes must be zero/ffill/interp/None: {bad_modes}"
        )

    if materialize:
        agg = agg.localCheckpoint(eager=False)
    spine = _spine(agg, keys, bucket_col, s)
    dense = spine.join(agg, on=[*keys, bucket_col], how="left")
    w = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(bucket_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    b = F.col(bucket_col)
    cols: list[Column] = [F.col(k) for k in keys] + [b]
    for c in vals:
        mode = fill.get(c)
        if mode == "zero":
            cols.append(F.coalesce(F.col(c), F.lit(0)).alias(c))
        elif mode == "ffill":
            cols.append(F.last(F.col(c), ignorenulls=True).over(w).alias(c))
        elif mode == "interp":
            pv = F.last(F.col(c), ignorenulls=True).over(w).cast("double")
            pb = F.last(
                F.when(F.col(c).isNotNull(), b), ignorenulls=True
            ).over(w)
            nv = F.first(F.col(c), ignorenulls=True).over(w_next).cast(
                "double"
            )
            nb = F.first(
                F.when(F.col(c).isNotNull(), b), ignorenulls=True
            ).over(w_next)
            # pv/nv NULL at the edges -> the whole expression is NULL
            cols.append(
                F.when(F.col(c).isNotNull(), F.col(c).cast("double"))
                .otherwise(pv + (nv - pv) * (b - pb) / (nb - pb))
                .alias(c)
            )
        else:
            cols.append(F.col(c))
    return dense.select(*cols)


def resample_gap_fill(
    df: DataFrame,
    ts_col: str,
    stride: int | str,
    key_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    fill: dict[str, str | None] | None = None,
    bucket_col: str = "bucket_us",
    materialize: bool = True,
) -> DataFrame:
    """resample + gap_fill in one call — the hypertable rollup."""
    agg = resample(df, ts_col, stride, key_cols, aggs, bucket_col)
    return gap_fill(agg, stride, key_cols, fill, bucket_col, materialize)


def resample_duckdb_sql(
    table: str,
    ts_col: str,
    stride: int | str,
    key_cols: list[str],
    agg_sql: dict[str, str],
    fill: dict[str, str | None] | None = None,
    bucket_col: str = "bucket_us",
) -> str:
    """GENERATE the DuckDB twin of resample_gap_fill — the oracle
    convention: SQL built from the same parameters the Spark chain
    consumes, engine-exact on the integer bucket/spine arithmetic.
    ``agg_sql`` maps output column -> aggregate SQL over the raw
    table (e.g. {'n': 'COUNT(*)', 's': 'SUM(CAST(value AS
    DECIMAL(18,4)))'}).  DuckDB's generate_series(bigint, bigint,
    bigint) is inclusive like Spark's sequence; LAST_VALUE ... IGNORE
    NULLS with a rows frame is the ffill twin."""
    keys = list(key_cols or [])
    s = stride_us(stride)
    fill = dict(fill or {})
    # same loud edges as gap_fill: a typo'd mode must not silently
    # fall through to the no-fill branch and diverge from the Spark twin
    bad = sorted(set(fill) - set(agg_sql))
    if bad:
        raise ValueError(f"fill names unknown value columns: {bad}")
    bad_modes = {
        c: m for c, m in fill.items()
        if m not in ("zero", "ffill", "interp", None)
    }
    if bad_modes:
        raise ValueError(
            f"fill modes must be zero/ffill/interp/None: {bad_modes}"
        )
    key_pre = "".join(f"{k}, " for k in keys)  # "" for a global series
    not_null = " AND ".join(
        [f"{ts_col} IS NOT NULL"] + [f"{k} IS NOT NULL" for k in keys]
    )
    agg_items = ", ".join(f"{sql} AS {name}" for name, sql in agg_sql.items())
    part = (
        f"PARTITION BY {', '.join('sp.' + k for k in keys)} " if keys else ""
    )
    prev_frame = (
        f"OVER ({part}ORDER BY sp.{bucket_col} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    next_frame = (
        f"OVER ({part}ORDER BY sp.{bucket_col} "
        f"ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)"
    )
    out_vals = []
    for name in agg_sql:
        mode = fill.get(name)
        if mode == "zero":
            out_vals.append(f"COALESCE(a.{name}, 0) AS {name}")
        elif mode == "ffill":
            out_vals.append(
                f"LAST_VALUE(a.{name} IGNORE NULLS) {prev_frame} AS {name}"
            )
        elif mode == "interp":
            pv = f"CAST(LAST_VALUE(a.{name} IGNORE NULLS) {prev_frame} AS DOUBLE)"
            pb = (
                f"LAST_VALUE(CASE WHEN a.{name} IS NOT NULL "
                f"THEN sp.{bucket_col} END IGNORE NULLS) {prev_frame}"
            )
            nv = f"CAST(FIRST_VALUE(a.{name} IGNORE NULLS) {next_frame} AS DOUBLE)"
            nb = (
                f"FIRST_VALUE(CASE WHEN a.{name} IS NOT NULL "
                f"THEN sp.{bucket_col} END IGNORE NULLS) {next_frame}"
            )
            out_vals.append(
                f"CASE WHEN a.{name} IS NOT NULL THEN CAST(a.{name} AS DOUBLE) "
                f"ELSE {pv} + ({nv} - {pv}) * (sp.{bucket_col} - {pb}) "
                f"/ ({nb} - {pb}) END AS {name}"
            )
        else:
            out_vals.append(f"a.{name} AS {name}")
    sp_key_pre = "".join(f"sp.{k}, " for k in keys)
    on = " AND ".join(
        [f"sp.{k} = a.{k}" for k in keys] + [f"sp.{bucket_col} = a.{bucket_col}"]
    )
    return f"""
WITH agg AS (
    SELECT {key_pre}CAST(epoch_us({ts_col})
             - ((epoch_us({ts_col}) % {s} + {s}) % {s}) AS BIGINT)
             AS {bucket_col},
           {agg_items}
    FROM {table}
    WHERE {not_null}
    GROUP BY ALL
), bounds AS (
    SELECT {key_pre}MIN({bucket_col}) AS mn, MAX({bucket_col}) AS mx
    FROM agg GROUP BY ALL
), spine AS (
    SELECT {key_pre}UNNEST(generate_series(mn, mx, {s})) AS {bucket_col}
    FROM bounds
)
SELECT {sp_key_pre}sp.{bucket_col}, {', '.join(out_vals)}
FROM spine sp LEFT JOIN agg a ON {on}
"""
