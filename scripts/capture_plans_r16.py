"""Capture `.explain("formatted")` for named bench rows into
plans/r16/<name>_<tag>.txt (the round-16 optimization evidence files).

The round-16 changes are flag-gated, so 'before' plans are captured
from the SAME code by forcing the round-15 form (kernel_merge=False,
materialize=True) via the env knob KNOVEX_R16_BEFORE=1 read by the
probe shims below — no stash dance, both captures reviewable together.

Usage: python scripts/capture_plans_r16.py <tag> [row ...]
  tag: 'before' | 'after'
  rows default to the round-16 optimization target set.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from knovexlite_spark.session import get_spark  # noqa: E402

DEFAULT_ROWS = [
    "gk_quantile",
    "gk_local_quantile",
    "gk_local_by_key",
    "gk_local_noex",
    "bm25_topk",
    "rrf_fuse",
    "semantic_dedup",
    "ts_rolling",
]


def _before_shims(qs):
    """Round-15-form variants of the flag-gated rows (same code, flag
    forced), for the 'before' captures."""
    from knovexlite_spark.engine import Engine
    from knovexlite_spark.ops.quantile import (
        gk_quantiles_by_key,
        gk_summary,
        gk_summary_local,
        gk_summary_local_by_key,
    )
    from knovexlite_spark.ops.retrieval import bm25_topk, rrf_fuse
    from knovexlite_spark.queries import pipeline

    def cents(spark, sf_dir):
        eng = Engine.for_dir(spark, sf_dir)
        return (
            eng.table("orders")
            .select(
                F.round(F.col("o_totalprice") * 100).cast("long").alias("c")
            )
            .unionByName(
                eng.table("lineitem").select(
                    F.round(F.col("l_extendedprice") * 100)
                    .cast("long")
                    .alias("c")
                )
            )
        )

    def gk_quantile(spark, sf_dir):
        return gk_summary(
            cents(spark, sf_dir), "c", k_build=64, k_compress=32,
            num_groups=32, merge_fan_in=8, kernel_merge=False,
        )

    def gk_local_quantile(spark, sf_dir):
        return gk_summary_local(
            cents(spark, sf_dir).repartition(32), "c", k=64,
            k_compress=32, fan_in=16, kernel_merge=False,
        )

    def gk_local_noex(spark, sf_dir):
        return gk_summary_local(
            cents(spark, sf_dir), "c", k=64, k_compress=32, fan_in=16,
            kernel_merge=False,
        )

    def gk_local_by_key(spark, sf_dir):
        li = Engine.for_dir(spark, sf_dir).table("lineitem").select(
            F.pmod(F.col("l_partkey"), F.lit(1024)).alias("key"),
            F.round(F.col("l_extendedprice") * 100)
            .cast("long")
            .alias("cents"),
        )
        summ = gk_summary_local_by_key(
            li.repartition(32), "key", "cents", k=64, k_compress=32,
            fan_in=16, kernel_merge=False,
        )
        return gk_quantiles_by_key(summ, "key", [0.5, 0.95, 0.99])

    def bm25(spark, sf_dir):
        d = pipeline._docs(spark, sf_dir).select("doc_id", "text")
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
        return bm25_topk(d, queries, k=10, materialize=True)

    def rrf(spark, sf_dir):
        lexical = bm25(spark, sf_dir).select("query_id", "doc_id", "rn")
        dense = pipeline._ann_brute(spark, sf_dir).select(
            "query_id", F.col("neighbor_id").alias("doc_id"), "rn"
        )
        return rrf_fuse([lexical, dense], k=60, out_k=10)

    def semantic_dedup_old_closure(spark, sf_dir):
        """The full row with the ROUND-15 closure (CC over ALL ids,
        not just pair-touched ones) — reconstructed inline."""
        from knovexlite_spark.ops.graph import connected_components

        # replicate semantic_dedup up to the pair list via its own
        # pieces, then the old all-nodes closure
        from knovexlite_spark.ops import cluster as C

        d = pipeline._emb_semsrc(spark, sf_dir)
        import numpy as np

        cent = C.kmeans_fit(d, 8, max_iter=3)
        # reuse the shipped operator for assign+pairs by calling it and
        # re-deriving only the closure: pairs are not exposed, so build
        # them exactly as semantic_dedup does
        spark_b = d.sparkSession.sparkContext.broadcast(cent)

        import pandas as pd

        def assign_multi(it):
            c = spark_b.value
            for pdf in it:
                if len(pdf) == 0:
                    continue
                mat = np.stack(pdf["embedding"].to_numpy()).astype(
                    np.float32
                )
                dist = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
                near = np.argsort(dist, axis=1)[:, :1]
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy(),
                        "cell": near.ravel().astype(np.int64),
                        "embedding": list(pdf["embedding"]),
                    }
                )

        assigned = d.mapInPandas(
            assign_multi,
            schema="vec_id long, cell long, embedding array<float>",
        )

        def cell_pairs(pdf):
            m = len(pdf)
            if m < 2:
                return pd.DataFrame(
                    {"doc_a": [], "doc_b": []}
                ).astype("int64")
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            mat = mat / norms[:, None]
            ids = pdf["vec_id"].to_numpy()
            out_a, out_b = [], []
            for s in range(0, m, 2048):
                strip = mat[s : s + 2048]
                cos = strip @ mat.T
                ii, jj = np.nonzero(cos >= 0.95)
                gi = ii + s
                keep = gi < jj
                out_a.append(np.minimum(ids[gi[keep]], ids[jj[keep]]))
                out_b.append(np.maximum(ids[gi[keep]], ids[jj[keep]]))
            if not out_a:
                return pd.DataFrame(
                    {"doc_a": [], "doc_b": []}
                ).astype("int64")
            return pd.DataFrame(
                {
                    "doc_a": np.concatenate(out_a),
                    "doc_b": np.concatenate(out_b),
                }
            ).drop_duplicates()

        pairs = assigned.groupBy("cell").applyInPandas(
            cell_pairs, schema="doc_a long, doc_b long"
        )
        nodes = d.select(F.col("vec_id").cast("long").alias("node"))
        comp = connected_components(
            nodes,
            pairs.select(
                F.col("doc_a").alias("h"), F.col("doc_b").alias("t")
            ),
        )
        sizes = comp.groupBy("component").agg(
            F.count("*").cast("long").alias("size")
        )
        return (
            comp.select(F.col("node").alias("doc"), "component")
            .join(sizes, "component")
            .select("doc", "component", "size")
        )

    return {
        "gk_quantile": gk_quantile,
        "gk_local_quantile": gk_local_quantile,
        "gk_local_noex": gk_local_noex,
        "gk_local_by_key": gk_local_by_key,
        "bm25_topk": bm25,
        "rrf_fuse": rrf,
        "semantic_dedup": semantic_dedup_old_closure,
        # ts_rolling 'before' (pre-contract-check) lives in
        # plans/r15/ts_rolling_after.txt; only 'after' is captured r16
        "ts_rolling": qs.get("ts_rolling"),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rows = sys.argv[2:] or DEFAULT_ROWS
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    spark = get_spark(app_name="capture_plans_r16", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    qs = bench.headline_queries()
    fns = _before_shims(qs) if tag == "before" else qs
    os.makedirs("plans/r16", exist_ok=True)
    for name in rows:
        fn = fns.get(name)
        if fn is None:
            print(f"skip {name}")
            continue
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r16/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
