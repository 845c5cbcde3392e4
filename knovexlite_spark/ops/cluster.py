"""Distributed k-means and semantic deduplication (SemDeDup).

Embedding-cluster curation for training corpora (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"): cluster the embedding space with k-means, then search
for high-cosine pairs WITHIN each cluster only — the pair search
becomes a per-cluster GEMM instead of a corpus x corpus one, the same
cost collapse IVF gives ANN probes.  Pairs close into components and
one survivor is kept per component via the shared dedup machinery
(ops/dedup.near_dup_clusters).

Two k-means implementations with different contracts:

- ``kmeans_fit`` — the production float path.  Lloyd's algorithm as a
  driver-side loop over corpus-sized Spark jobs (the BPE / n-gram-LM
  split: corpus-sized work distributed, parameter-sized state — the
  k x dim centroid matrix — on the driver).  One job per iteration:
  an Arrow argmin kernel (ops/similarity.ivf_assign, centroids
  broadcast) feeds ONE combinable groupBy(cell) whose per-dimension
  sums are plain F.sum columns — map-side partial aggregation does the
  per-partition combining a hand-rolled treeAggregate would, and the
  shuffle moves at most partitions x k rows.
- ``kmeans_exact`` — an integer-quantized variant whose every
  arithmetic step is exact and therefore ENGINE-INDEPENDENT: vectors
  are floor-quantized to BIGINT, centroids are carried as (sum-vector,
  count) pairs so means are never materialized as floats, and the
  assignment cost compares CAST(||x*n - s||^2 AS DOUBLE) / n^2 — one
  correctly-rounded double division of exact integers, identical in
  any IEEE-754 engine regardless of row order.  This is the
  correctness-gate form (the emb_kmeans oracle replays it in DuckDB
  unrolled to the same iteration count); it doubles as the reference
  implementation the float path is property-tested against.

At 100 TB: assignment is a broadcast map (no shuffle); the update is
one combinable groupBy of k rows; the within-cluster pair search is an
applyInPandas over cells (cells are corpus/k-sized — pick k so a cell
fits an executor, exactly the IVF sizing rule), with `probes=2`
recovering boundary-straddling duplicates the hard partition misses.

Reference parity: the reference engine ships no clustering tier; this
is part of the beyond-reference LLM-data-pipeline surface (SURVEY §2
documents/embeddings tables).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from knovexlite_spark.ops.similarity import ivf_assign, sample_centroids


def kmeans_fit(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Lloyd's k-means over an ARRAY<FLOAT> column; returns the final
    [k, dim] float32 centroid matrix (model parameters — driver-sized
    by definition, like BPE merge ranks and n-gram LM tables).

    Per iteration exactly ONE Spark job: ivf_assign's Arrow kernel
    (broadcast centroids, map-only) emits (id, cell, vec); a single
    groupBy(cell) with per-dimension F.sum columns + count reduces to
    k rows (map-side partial agg = the distributed combine).  Empty
    cells keep their previous centroid.  Stops when the max centroid
    L2 shift drops below ``tol`` or after ``max_iter`` iterations.

    ``init``: explicit [k, dim] start (tests / warm restarts);
    defaults to ops/similarity.sample_centroids (deterministic sample
    + driver-side refinement)."""
    if init is not None:
        cent = np.asarray(init, dtype=np.float32).copy()
        if cent.shape[0] != k:
            raise ValueError(f"init has {cent.shape[0]} rows, expected k={k}")
    else:
        cent = sample_centroids(df, k, vec_col=vec_col, seed=seed)
    dim = cent.shape[1]
    sums = [F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}") for i in range(dim)]
    for _ in range(max_iter):
        assigned = ivf_assign(df, cent, id_col=id_col, vec_col=vec_col, keep_vec=True)
        stats = (
            assigned.groupBy("cell")
            .agg(F.count("*").alias("n"), *sums)
            .collect()
        )
        new_cent = cent.copy()
        for r in stats:
            c = int(r["cell"])
            new_cent[c] = np.array(
                [r[f"s{i}"] for i in range(dim)], dtype=np.float64
            ) / float(r["n"])
        shift = float(np.sqrt(((new_cent - cent) ** 2).sum(axis=1)).max())
        cent = new_cent
        if shift < tol:
            break
    return cent


# -- integer-exact variant (gate / reference form) -------------------------

#: floor(x * 2^10) quantization.  Exactness budget (all BIGINT, and the
#: squared-distance total stays < 2^63): with |x| <= 1 the per-dim term
#: (x*n - s)^2 is < (2 * 2^10 * n)^2, so dim=64 needs n < ~2^20 rows in
#: any one cell — far above every gate corpus.  Power-of-two scaling and
#: floor() are exact and identical in Spark and DuckDB (round() is not:
#: half-way ties are engine-defined).
EXACT_SCALE = 1024


def _exact_assign(q: DataFrame, cents: DataFrame) -> DataFrame:
    """One exact assignment pass: broadcast the k-row (cell, s, n)
    centroid frame, cost = CAST(sum_i (x_i*n - s_i)^2 AS DOUBLE)/n^2.
    The integer numerator is order-independent and the single division
    is correctly rounded, so ANY IEEE engine produces the identical
    double — ties break to the lowest cell on both sides."""
    num = F.aggregate(
        F.zip_with("xq", "s", lambda x, s: (x * F.col("n") - s) * (x * F.col("n") - s)),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    cost = num.cast("double") / (F.col("n") * F.col("n")).cast("double")
    w = Window.partitionBy("vec_id").orderBy("cost", "cell")
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("cost", cost)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "xq", "cell")
    )


def _exact_update(assigned: DataFrame, prev: DataFrame, dim: int) -> DataFrame:
    """Exact centroid update: per-cell (sum-vector, count) as BIGINTs —
    ONE combinable groupBy; empty cells inherit the previous (s, n)."""
    upd = assigned.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_u"),
        F.array(*[F.sum(F.col("xq")[i]).alias(f"u{i}") for i in range(dim)]).alias("s_u"),
    )
    return (
        prev.select("cell", F.col("s").alias("s_p"), F.col("n").alias("n_p"))
        .join(upd, "cell", "left")
        .select(
            "cell",
            F.coalesce("s_u", "s_p").alias("s"),
            F.coalesce("n_u", "n_p").alias("n"),
        )
    )


def kmeans_exact(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = EXACT_SCALE,
    dim: int | None = None,
) -> DataFrame:
    """Integer-exact k-means, unrolled lazily to ``iters`` update
    passes; returns (vec_id, cell) — the assignment AFTER the last
    update.  Initial centroids are the ``k`` vectors with the smallest
    ids (cell = id rank), carried as (s=xq, n=1).

    Every value that crosses an engine boundary is either a BIGINT
    (exact, order-free) or one double division of two exact BIGINTs
    (correctly rounded once) — so the emb_kmeans DuckDB oracle matches
    hash-for-hash without any tolerance machinery.  The whole
    computation is ONE lazy plan: broadcast joins for assignment,
    combinable k-row groupBys for updates — nothing corpus-sized ever
    reaches the driver."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("kmeans_exact on an empty frame")
        dim = len(first[0])
    q = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
        ).alias("xq"),
    )
    w = Window.orderBy("vec_id")
    cents = (
        q.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            (F.col("rn") - 1).cast("long").alias("cell"),
            F.col("xq").alias("s"),
            F.lit(1).cast("long").alias("n"),
        )
    )
    assigned = _exact_assign(q, cents)
    for _ in range(iters):
        # each cents frame is consumed twice (broadcast build in the
        # next assign + prev side of the next update) and ReuseExchange
        # does NOT dedup across a broadcast boundary — the lazy
        # localCheckpoint computes the k-row frame once per iteration
        # instead of re-walking the whole unrolled lineage.
        cents = _exact_update(assigned, cents, dim).localCheckpoint(eager=False)
        assigned = _exact_assign(q, cents)
    return assigned.select("vec_id", "cell")


def semantic_pairs_exact(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    threshold_num: int = 4,
    threshold_den: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = EXACT_SCALE,
) -> DataFrame:
    """Within-cell high-cosine pairs in EXACT integer arithmetic:
    after kmeans_exact assignment, pair (a, b) survives iff

        cos(a, b) >= threshold_num / threshold_den   (and dot > 0)

    decided as  den^2 * dot^2 >= num^2 * |a|^2 * |b|^2  over the
    quantized BIGINT vectors — the raw_counts trick from the MinHash
    gates: no float leaves the query, the boundary case is decided
    exactly, and the DuckDB oracle agrees hash-for-hash.  The pair
    search is an EQUI-join on cell (never a corpus cartesian).
    Output: (doc_a, doc_b, dot)."""
    q = df.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * F.lit(float(scale))).cast("long")
        ).alias("xq"),
    )
    cells = kmeans_exact(
        df, k=k, iters=iters, vec_col=vec_col, id_col=id_col, scale=scale
    ).join(q, "vec_id")
    a = cells.select(
        F.col("cell"), F.col("vec_id").alias("doc_a"), F.col("xq").alias("xa")
    )
    b = cells.select(
        F.col("cell"), F.col("vec_id").alias("doc_b"), F.col("xq").alias("xb")
    )
    dot = F.aggregate(
        F.zip_with("xa", "xb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )
    sq = lambda col: F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x * x), F.lit(0).cast("long"), lambda acc, t: acc + t
    )
    return (
        a.join(b, "cell")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("dot", dot)
        .withColumn("na", sq(F.col("xa")))
        .withColumn("nb", sq(F.col("xb")))
        .filter(
            (F.col("dot") > 0)
            & (
                F.lit(threshold_den * threshold_den) * F.col("dot") * F.col("dot")
                >= F.lit(threshold_num * threshold_num) * F.col("na") * F.col("nb")
            )
        )
        .select("doc_a", "doc_b", "dot")
    )


def semantic_dedup(
    df: DataFrame,
    k: int,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_iter: int = 5,
    seed: int = 42,
    probes: int = 1,
    block: int = 2048,
    centroids: np.ndarray | None = None,
    quantized: bool = False,
    scale_col: str = "scale",
) -> DataFrame:
    """SemDeDup: k-means partition + within-cluster cosine pair search
    + transitive closure -> (doc, component, size); ``filter(doc ==
    component)`` keeps one survivor per semantic-duplicate group
    (component = MIN id, the canonical-survivor convention shared with
    every other dedup path).

    ``quantized=True`` (round-8 stretch #8): ``vec_col`` holds int8
    qvecs (ops/similarity.quantize_embeddings) with ``scale_col``
    riding along.  The assign kernel dequantizes per Arrow batch (one
    multiply — centroids are float, euclidean needs real values), but
    the assign->cells SHUFFLE carries the int8 payload (~4x smaller —
    the lever at 100 TB, where that shuffle is corpus-sized), and the
    per-cell pair GEMM runs on the RAW qvec matrix: per-vector scales
    are positive scalars, so they cancel in cosine normalization —
    no dequant in the hot loop at all.  ``centroids`` must be supplied
    in FLOAT space when quantized (fit on a float sample).

    The pair search runs per cell inside applyInPandas — a [m, dim]
    normalized GEMM tiled in ``block``-row strips so a skewed cell
    never materializes an m x m matrix, only block x m strips.  Pick k
    so corpus/k rows of float32 fit an executor (the IVF sizing rule);
    duplicates straddling a cell boundary are invisible to probes=1 —
    ``probes=2`` assigns each vector to its two nearest cells and
    dedups the pair list, the SemDeDup paper's stated recall knob.

    ``centroids``: pass a precomputed model (e.g. from kmeans_fit on a
    sample) to skip fitting — at 100 TB the model is always fit on a
    sample, never the corpus."""
    if probes < 1:
        raise ValueError(f"probes must be >= 1, got {probes}")
    if quantized and centroids is None:
        raise ValueError(
            "semantic_dedup(quantized=True) needs centroids= fit in float "
            "space (e.g. kmeans_fit on a float sample)"
        )
    cent = (
        np.asarray(centroids, dtype=np.float32)
        if centroids is not None
        else kmeans_fit(
            df, k, vec_col=vec_col, id_col=id_col, max_iter=max_iter, seed=seed
        )
    )
    spark = df.sparkSession
    b_c = spark.sparkContext.broadcast(cent)
    n_probe = min(probes, cent.shape[0])

    def assign_multi(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = b_c.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
            if quantized:  # dequant for the euclidean assign only
                mat = mat * pdf[scale_col].to_numpy()[:, None].astype(np.float32)
            d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            near = np.argsort(d, axis=1)[:, :n_probe]
            out = {
                "vec_id": np.repeat(pdf[id_col].to_numpy(), n_probe),
                "cell": near.ravel().astype(np.int64),
                vec_col: [v for v in pdf[vec_col] for _ in range(n_probe)],
            }
            yield pd.DataFrame(out)

    payload_type = "array<tinyint>" if quantized else "array<float>"
    assigned = df.mapInPandas(
        assign_multi,
        schema=f"vec_id long, cell long, {vec_col} {payload_type}",
    )

    thr = float(threshold)

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        # raw qvecs are fine here: positive per-vector scales cancel in
        # the cosine normalization below
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        ids = pdf["vec_id"].to_numpy()
        out_a, out_b = [], []
        for s in range(0, m, block):
            strip = mat[s : s + block]
            cos = strip @ mat.T
            ii, jj = np.nonzero(cos >= thr)
            gi = ii + s
            keep = gi < jj  # upper triangle only, no self pairs
            out_a.append(np.minimum(ids[gi[keep]], ids[jj[keep]]))
            out_b.append(np.maximum(ids[gi[keep]], ids[jj[keep]]))
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        ).drop_duplicates()

    pairs = assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema="doc_a long, doc_b long"
    )
    if n_probe > 1:
        pairs = pairs.dropDuplicates(["doc_a", "doc_b"])

    from knovexlite_spark.ops.dedup import near_dup_clusters

    return near_dup_clusters(
        df.select(F.col(id_col).cast("long").alias("doc_id")), pairs, id_col="doc_id"
    )
