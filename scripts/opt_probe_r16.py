"""Round-16 optimization probes (guide §1 — measure first, noop sink).

Same methodology as scripts/opt_probe_r15.py (2 warm + 3 timed, min and
median, labeled-artifact merge) with the round-16 A/B pairs:

- gk local tier: kernel merge (gk_tree_compress_local) vs the window-SQL
  tree chain, per path (global, noex, by-key) — SAME session, the flag
  makes the pair directly comparable;
- retrieval: bm25/rrf with materialize=True vs False (VERDICT #4);
- semantic_dedup stage split: assign-only, +pairs, +closure (VERDICT #5);
- mg rows: plan-construction vs execution split (VERDICT #7).

Usage: python scripts/opt_probe_r16.py [sf_dir] [probe ...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knovexlite_spark.engine import Engine  # noqa: E402
from knovexlite_spark.session import get_spark  # noqa: E402

WARM = 2
ITERS = 3


def _time(spark, name, fn, sf_dir, out):
    spark.sparkContext.setJobDescription(f"probe:{name}")
    try:
        for _ in range(WARM):
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts = []
        for _ in range(ITERS):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.time() - t0, 3))
        out[name] = {
            "iters": ts,
            "min": min(ts),
            "median": round(statistics.median(ts), 3),
        }
        print(
            f"  {name:40s} min {min(ts):6.3f} med {statistics.median(ts):6.3f}",
            flush=True,
        )
    finally:
        spark.sparkContext.setJobDescription(None)


def _plan_time(spark, name, fn, sf_dir, out):
    ts = []
    for _ in range(3):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df._jdf.queryExecution().executedPlan()
        ts.append(round(time.time() - t0, 3))
    out[f"plan:{name}"] = {"iters": ts, "min": min(ts)}
    print(f"  plan:{name:35s} min {min(ts):6.3f}", flush=True)


# --- gk local tier: kernel vs SQL-chain merge --------------------------------

def _gklk_src(spark, sf_dir):
    return Engine.for_dir(spark, sf_dir).table("lineitem").select(
        F.pmod(F.col("l_partkey"), F.lit(1024)).alias("key"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )


def _gklk(kernel):
    def fn(spark, sf_dir):
        from knovexlite_spark.ops.quantile import (
            gk_quantiles_by_key,
            gk_summary_local_by_key,
        )

        summ = gk_summary_local_by_key(
            _gklk_src(spark, sf_dir).repartition(32), "key", "cents",
            k=64, k_compress=32, fan_in=16, kernel_merge=kernel,
        )
        return gk_quantiles_by_key(summ, "key", [0.5, 0.95, 0.99])

    return fn


def _gk_cents(spark, sf_dir):
    eng = Engine.for_dir(spark, sf_dir)
    return (
        eng.table("orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long").alias("c"))
        .unionByName(
            eng.table("lineitem").select(
                F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
            )
        )
    )


def _gkl(kernel, repart):
    def fn(spark, sf_dir):
        from knovexlite_spark.ops.quantile import gk_summary_local

        src = _gk_cents(spark, sf_dir)
        if repart:
            src = src.repartition(32)
        return gk_summary_local(
            src, "c", k=64, k_compress=32, fan_in=16, kernel_merge=kernel
        )

    return fn


# --- retrieval: materialize A/B ----------------------------------------------

def _bm25(materialize):
    def fn(spark, sf_dir):
        from knovexlite_spark.ops.retrieval import bm25_topk
        from knovexlite_spark.queries.pipeline import _docs

        d = _docs(spark, sf_dir).select("doc_id", "text")
        queries = (
            d.orderBy("doc_id")
            .limit(5)
            .select(
                F.col("doc_id").alias("query_id"),
                F.array_join(
                    F.slice(F.split(F.trim("text"), r"\s+"), 1, 8), " "
                ).alias("text"),
            )
        )
        return bm25_topk(d, queries, k=10, materialize=materialize)

    return fn


# --- semantic_dedup stage split ----------------------------------------------

_SEM_CENT: dict = {}


def _sem_centroids(spark, sf_dir):
    from knovexlite_spark.ops.cluster import kmeans_fit
    from knovexlite_spark.queries.pipeline import _emb_semsrc

    if sf_dir not in _SEM_CENT:
        _SEM_CENT[sf_dir] = kmeans_fit(
            _emb_semsrc(spark, sf_dir), 8, max_iter=3
        )
    return _SEM_CENT[sf_dir]


def _sem_assign_only(spark, sf_dir):
    """stage 1: the multi-probe argmin assign (mapInPandas) only."""
    import numpy as np
    import pandas as pd

    from knovexlite_spark.queries.pipeline import _emb_semsrc

    cent = _sem_centroids(spark, sf_dir)
    d = _emb_semsrc(spark, sf_dir)
    b_c = spark.sparkContext.broadcast(cent)

    def assign(it):
        c = b_c.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            dst = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            near = np.argsort(dst, axis=1)[:, :1]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": near.ravel().astype(np.int64),
                }
            )

    return d.mapInPandas(assign, schema="vec_id long, cell long")


def _sem_pairs_only(spark, sf_dir):
    """stages 1-2: assign + per-cell pair GEMM (no closure)."""
    from knovexlite_spark.ops.cluster import semantic_dedup  # noqa: F401
    import numpy as np
    import pandas as pd

    from knovexlite_spark.queries.pipeline import _emb_semsrc

    cent = _sem_centroids(spark, sf_dir)
    d = _emb_semsrc(spark, sf_dir)
    b_c = spark.sparkContext.broadcast(cent)

    def assign(it):
        c = b_c.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            dst = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            near = np.argsort(dst, axis=1)[:, :1]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cell": near.ravel().astype(np.int64),
                    "embedding": list(pdf["embedding"]),
                }
            )

    assigned = d.mapInPandas(
        assign, schema="vec_id long, cell long, embedding array<float>"
    )

    thr = 0.95

    def cell_pairs(pdf):
        m = len(pdf)
        if m < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        ids = pdf["vec_id"].to_numpy()
        out_a, out_b = [], []
        for s in range(0, m, 2048):
            strip = mat[s : s + 2048]
            cos = strip @ mat.T
            ii, jj = np.nonzero(cos >= thr)
            gi = ii + s
            keep = gi < jj
            out_a.append(np.minimum(ids[gi[keep]], ids[jj[keep]]))
            out_b.append(np.maximum(ids[gi[keep]], ids[jj[keep]]))
        if not out_a:
            return pd.DataFrame({"doc_a": [], "doc_b": []}).astype("int64")
        return pd.DataFrame(
            {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
        ).drop_duplicates()

    return assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema="doc_a long, doc_b long"
    )


def _sem_nofit(spark, sf_dir):
    """assign + pairs + closure (full row minus the kmeans fit)."""
    from knovexlite_spark.ops.cluster import semantic_dedup
    from knovexlite_spark.queries.pipeline import _emb_semsrc

    return semantic_dedup(
        _emb_semsrc(spark, sf_dir), k=8, threshold=0.95, max_iter=3,
        centroids=_sem_centroids(spark, sf_dir),
    )


def _sem_closure(new):
    """Isolate the closure: pairs (the _sem_pairs_only frame) -> the
    NEW pair-touched-only near_dup_clusters vs the OLD all-nodes CC
    form, same session."""

    def fn(spark, sf_dir):
        from pyspark.sql import functions as FF

        from knovexlite_spark.queries.pipeline import _emb_semsrc

        ids = _emb_semsrc(spark, sf_dir).select(
            FF.col("vec_id").cast("long").alias("doc_id")
        )
        pairs = _sem_pairs_only(spark, sf_dir)
        if new:
            from knovexlite_spark.ops.dedup import near_dup_clusters

            return near_dup_clusters(ids, pairs, id_col="doc_id")
        from knovexlite_spark.ops.graph import connected_components

        nodes = ids.select(FF.col("doc_id").alias("node"))
        comp = connected_components(
            nodes,
            pairs.select(
                FF.col("doc_a").alias("h"), FF.col("doc_b").alias("t")
            ),
        )
        sizes = comp.groupBy("component").agg(
            FF.count("*").cast("long").alias("size")
        )
        return (
            comp.select(FF.col("node").alias("doc"), "component")
            .join(sizes, "component")
            .select("doc", "component", "size")
        )

    return fn


PROBES = {
    "gklk_kernel": _gklk(True),
    "gklk_sql": _gklk(False),
    "gkl_kernel": _gkl(True, True),
    "gkl_sql": _gkl(False, True),
    "gkl_noex_kernel": _gkl(True, False),
    "gkl_noex_sql": _gkl(False, False),
    "bm25_mat": _bm25(True),
    "bm25_nomat": _bm25(False),
    "sem_assign": _sem_assign_only,
    "sem_pairs": _sem_pairs_only,
    "sem_nofit": _sem_nofit,
    "sem_closure_new": _sem_closure(True),
    "sem_closure_old": _sem_closure(False),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or list(PROBES)
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_spark(
        app_name="opt_probe_r16",
        extra_conf={
            "spark.driver.extraJavaOptions": f"-Xms{mem} -XX:+AlwaysPreTouch"
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = Engine.for_dir(spark, sf_dir)
    for t in warm.tables.values():
        t.limit(1).count()
    spark.range(0, 64, 1, 32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict = {}
    row_qs = None
    for n in names:
        if n.startswith("row:"):
            if row_qs is None:
                import bench

                row_qs = bench.headline_queries()
            _time(spark, n, row_qs[n[4:]], sf_dir, out)
        elif n.startswith("plan:"):
            if row_qs is None:
                import bench

                row_qs = bench.headline_queries()
            _plan_time(spark, n[5:], row_qs[n[5:]], sf_dir, out)
        else:
            _time(spark, n, PROBES[n], sf_dir, out)
    print(json.dumps(out))
    path = "artifacts/opt_probe_r16.json"
    label = os.environ.get("SPARK_GRAFT_PROBE_LABEL")
    merged: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                merged = json.load(f)
        except Exception:
            merged = {}
    if label:
        merged.setdefault(label, {}).update(out)
    else:
        merged.update(out)
    os.makedirs("artifacts", exist_ok=True)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1)




# --- gk_build_local_by_key internals: groupby-per-batch vs buffered ---------

def _gklk_build_now(spark, sf_dir):
    """The shipped build (groupby per Arrow batch)."""
    from knovexlite_spark.ops.quantile import gk_build_local_by_key

    return gk_build_local_by_key(
        _gklk_src(spark, sf_dir).repartition(32), "key", "cents", k=64
    )


def _gklk_build_buffered(spark, sf_dir):
    """PROTOTYPE (probe-only): buffer whole batches under the existing
    _KCAP, then ONE groupby + per-key fold — same chunk content below
    the cap (value-order-insensitive kernels), measuring whether the
    per-batch pandas groupby is the hot loop."""
    import numpy as np
    import pandas as pd

    from pyspark.sql import functions as FF
    from pyspark.sql.types import LongType, StructField, StructType

    from knovexlite_spark.ops.quantile import PyGkCascade

    base = (
        _gklk_src(spark, sf_dir)
        .repartition(32)
        .filter(FF.col("cents").isNotNull())
        .filter(FF.col("key").isNotNull())
        .select("key", FF.col("cents").cast("long").alias("v"))
    )
    out_schema = StructType(
        [base.schema["key"]]
        + [
            StructField("src", LongType()),
            StructField("v", LongType()),
            StructField("rmin", LongType()),
            StructField("rmax", LongType()),
        ]
    )
    k_, fan_, _KCAP = 64, 16, 1 << 18

    def summarize(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        cascades: dict = {}
        buf_k, buf_v, total = [], [], 0

        def flush_all():
            nonlocal buf_k, buf_v, total
            if not buf_k:
                return
            ka = np.concatenate(buf_k)
            va = np.concatenate(buf_v)
            order = np.argsort(ka, kind="stable")
            ka, va = ka[order], va[order]
            uk, starts = np.unique(ka, return_index=True)
            bounds = np.append(starts, ka.size)
            for i, kt in enumerate(uk):
                casc = cascades.get(kt)
                if casc is None:
                    casc = cascades[kt] = PyGkCascade(k_, fan_)
                casc.add(va[bounds[i]:bounds[i + 1]])
            buf_k, buf_v, total = [], [], 0

        for pdf in batches:
            if not len(pdf):
                continue
            buf_k.append(pdf["key"].to_numpy())
            buf_v.append(pdf["v"].to_numpy())
            total += len(pdf)
            if total > _KCAP:
                flush_all()
        flush_all()
        if cascades:
            recs = []
            for kt, casc in cascades.items():
                for v, rmin, rmax in casc.finish():
                    recs.append((kt, pid, v, rmin, rmax))
            if recs:
                yield pd.DataFrame(
                    recs, columns=["key", "src", "v", "rmin", "rmax"]
                )

    return base.mapInPandas(summarize, schema=out_schema)


PROBES["gklk_build_now"] = _gklk_build_now
PROBES["gklk_build_buffered"] = _gklk_build_buffered




def _gkq(kernel):
    def fn(spark, sf_dir):
        from knovexlite_spark.ops.quantile import gk_summary

        return gk_summary(
            _gk_cents(spark, sf_dir), "c", k_build=64, k_compress=32,
            num_groups=32, merge_fan_in=8, kernel_merge=kernel,
        )

    return fn


PROBES["gkq_kernel"] = _gkq(True)
PROBES["gkq_sql"] = _gkq(False)


if __name__ == "__main__":
    main()
