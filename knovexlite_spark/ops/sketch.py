"""Count-min sketch as a native DataFrame construction — frequency
estimation with FIXED-SIZE state for key spaces that outgrow memory.

An exact `groupBy(key).count()` is already combinable, but its state
is O(distinct keys) — at 100 TB a token/url/ngram vocabulary can be
billions of keys, and the aggregation's hash maps + shuffle scale with
it.  The count-min sketch bounds state at ``depth x width`` counters
REGARDLESS of vocabulary: each row increments one bucket per depth
(bucket = salted hash mod width), and ``estimate(key) = min over
depths of its bucket count``.  Guarantees (Cormode-Muthukrishnan,
public result): estimates never UNDER-count, and over-count by more
than ``e/width * N`` with probability only ``exp(-depth)``.

Spark realization is sketch-native: the build is one explode(depth
structs) + ONE combinable groupBy over (depth, bucket) — map-side
partial aggregation caps every task's output at depth x width rows, so
the shuffle is sketch-sized, not vocabulary-sized.  Estimation is an
equi-join of the (tiny, broadcastable) sketch onto the probe keys.
No UDFs anywhere; xxhash64 keeps hashing in the JVM.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(key: F.Column, d: int, width: int, salt: str) -> F.Column:
    return F.pmod(F.xxhash64(F.lit(salt), F.lit(d), key), F.lit(width))


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Build the sketch: (depth, bucket, cnt) with at most depth*width
    rows.  Deterministic for a given salt (salted xxhash64 family), so
    estimates are reproducible across runs and partitionings."""
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("depth"),
                    _bucket(F.col(key_col), d, width, salt).alias("bucket"),
                )
                for d in range(depth)
            ]
        )
    ).alias("e")
    return (
        df.select(entries)
        .select(F.col("e.depth").alias("depth"), F.col("e.bucket").alias("bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 2048,
    salt: str = "cms",
) -> DataFrame:
    """Estimate counts for the probe ``keys``: join each key's per-depth
    bucket against the sketch and take the min.  The sketch is
    depth*width rows — broadcast it; missing buckets count 0 (a key
    whose bucket was never touched has estimate 0 = its true count)."""
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("depth"),
                        _bucket(F.col(key_col), d, width, salt).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("e"),
    ).select(key_col, F.col("e.depth").alias("depth"), F.col("e.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("estimate"))
    )


def cms_error_bound(n_rows: int, width: int) -> int:
    """The standard count-min overestimate bound eps*N with
    eps = e/width (exceeded per-depth with probability 1/e; over all
    depths with probability exp(-depth))."""
    return int(math.ceil(math.e / width * n_rows))
