"""As-of (nearest-predecessor) and range joins — the time-series
enrichment operators the brief names as canonical Spark gaps ("an
operator Spark lacks (e.g., as-of join, range join)").

``asof_join``: for every left row, attach the LATEST right row with
right.ts <= left.ts per key (direction="backward"; "forward" gives the
earliest right.ts >= left.ts) — the standard market-data/metrics
enrichment.  Spark-first realization, NO per-row loops and NO
inequality join (a naive theta-join is a per-key cartesian):

  1. tag and UNION the two sides (right rows carry their payload,
     left rows carry NULL payload),
  2. ONE hash exchange on the key + per-partition sort on
     (key, ts, side) — exactly a SortMergeJoin's cost envelope,
  3. a running last-non-null window carries the most recent right
     payload forward onto each left row (rowsBetween unbounded..0 —
     Spark's WindowExec streams this frame incrementally, O(1) memory
     per row, no O(rows^2) re-scan),
  4. filter back to left rows; an optional ``tolerance`` nulls out
     matches older than the window.

Scale shape: cost == one big-table sort-merge pass, partitioned by
key; skewed keys behave exactly like a skewed SMJ (same mitigations).
Ties (right.ts == left.ts) MATCH, mirroring DuckDB/pandas
``merge_asof`` semantics — the right side sorts before the left on
equal timestamps.

``range_join``: equi-key + interval containment (point IN [start,
end]) via interval BUCKETING: intervals are exploded to the buckets
they overlap, points join their bucket (equi-join!), and the exact
containment predicate filters the bucket-local candidates.  The
inequality never reaches the join operator, so Catalyst plans a hash
join instead of a per-key nested loop; bucket width trades explode
factor against candidate density (set it near the median interval
length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] = (),
    direction: str = "backward",
    tolerance: int | float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join.  ``on``: ordering column (numeric or
    timestamp); ``by``: equi-key columns; ``tolerance``: max |left.on -
    right.on| for a match (same unit as ``on``; timestamps compare via
    their numeric cast).  Right payload columns keep their names (or
    gain ``suffix`` on collision); unmatched left rows keep NULLs, plus
    ``{on}{suffix}`` = the matched right timestamp.

    Scale note: parallelism comes from ``by`` — the window partitions
    on the key columns, so an EMPTY ``by`` is a global as-of that
    sorts everything into ONE window task (fine for dimension-sized
    frames, wrong for a fact table; if there is no natural key, bucket
    the time axis into a synthetic key and stitch bucket boundaries)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    bys = list(by)
    payload = [c for c in right.columns if c != on and c not in bys]
    ren = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    r = right.select(
        *bys,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(ren[c]) for c in payload],
    )
    l = left.select(
        "*",
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
    )
    for c in ren.values():
        l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    l = l.select(*bys, "__ts", "__side", *[c for c in left.columns if c not in bys], *ren.values())
    lcols = [c for c in left.columns if c not in bys]
    r = r.select(
        *bys,
        "__ts",
        "__side",
        *[F.lit(None).cast(dict(l.dtypes)[c]).alias(c) for c in lcols],
        *ren.values(),
    )
    both = l.unionByName(r)

    if direction == "forward":
        # forward = backward on the reversed axis; negate a numeric
        # image of the ordering column
        order_expr = (-F.col("__ts").cast("double")).alias("__ord")
    else:
        order_expr = F.col("__ts").cast("double").alias("__ord")
    both = both.select("*", order_expr)
    w = (
        Window.partitionBy(*bys)
        .orderBy("__ord", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = both.select(
        *bys,
        "__ts",
        "__side",
        *lcols,
        *[
            F.last(c, ignorenulls=True).over(w).alias(c)
            for c in ren.values()
        ],
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True)
        .over(w)
        .alias("__match_ts"),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        dist = F.abs(
            F.col("__ts").cast("double") - F.col("__match_ts").cast("double")
        )
        keep = F.col("__match_ts").isNotNull() & (dist <= F.lit(float(tolerance)))
        out = out.select(
            *bys,
            *lcols,
            *[F.when(keep, F.col(c)).alias(c) for c in ren.values()],
            F.when(keep, F.col("__match_ts")).alias(f"{on}{suffix}"),
        )
    else:
        out = out.select(
            *bys, *lcols, *ren.values(),
            F.col("__match_ts").alias(f"{on}{suffix}"),
        )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: tuple[str, ...] = (),
    bucket_width: int = 3600,
) -> DataFrame:
    """Point-in-interval join via bucketing (inclusive bounds).  Both
    sides map to integer buckets of ``bucket_width`` (intervals explode
    to every bucket they overlap via ``sequence`` — JVM generator, no
    UDF); the join is a pure EQUI-join on (by..., bucket) with the
    exact containment filter applied to bucket-local candidates, so no
    nested-loop join ever appears in the plan (pinned by tests).
    Output: one row per (point row, containing interval)."""
    bw = int(bucket_width)
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col).cast("double") / bw).cast("long")
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / bw).cast("long"),
                F.floor(F.col(end_col).cast("double") / bw).cast("long"),
            )
        ),
    )
    keys = list(by) + ["__bucket"]
    return (
        p.join(iv, keys)
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("__bucket")
    )
