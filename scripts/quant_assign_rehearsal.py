"""Measure the int8-qvec shuffle/cache shrink for the quantized
cluster/ANN assignment paths (round-8 stretch #8).

semantic_dedup's scale-critical intermediate is the ASSIGNED frame
(vec_id, cell, vector-payload): it is corpus-sized and crosses the
assign->cells shuffle.  This rehearsal materializes that exact payload
both ways — float32 `embedding` vs int8 `qvec` — on a replicated
corpus, persists each (MEMORY_ONLY, the same serialized form the
shuffle writes), and reports cached bytes from getRDDStorageInfo plus
the wall time of the downstream semantic_dedup A/B.

Usage: python scripts/quant_assign_rehearsal.py [replication]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark import StorageLevel
from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops.similarity import (
    ivf_assign,
    quantize_embeddings,
    sample_centroids,
)
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def _cached_bytes(spark) -> int:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(i.memSize() + i.diskSize() for i in infos)


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    spark = get_spark(app_name="quant_assign_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    emb = Engine.for_dir(spark, SRC).table("embeddings").select(
        "vec_id", "embedding"
    )
    big = emb.crossJoin(
        spark.range(rep).select(F.col("id").alias("__r"))
    ).select(
        (F.col("vec_id") * rep + F.col("__r")).alias("vec_id"), "embedding"
    ).localCheckpoint()
    n = big.count()
    cent = sample_centroids(emb, n_cells=16)
    out: dict = {"rows": n, "dim": 64, "replication": rep}

    # float payload: the assigned frame exactly as semantic_dedup
    # shuffles it.  Cached bytes are measured as DELTAS over the
    # checkpoint baseline so only the assigned frame is attributed.
    base = _cached_bytes(spark)
    fl = ivf_assign(big, cent, keep_vec=True).persist(
        StorageLevel.MEMORY_ONLY
    )
    fl.count()
    out["assigned_float_mb"] = round((_cached_bytes(spark) - base) / 1e6, 1)
    fl.unpersist(blocking=True)

    qbig = quantize_embeddings(big).select(
        "vec_id", F.col("qvec").alias("embedding"), "scale"
    ).localCheckpoint()
    base = _cached_bytes(spark)
    qassigned = qbig.mapInPandas(  # same payload shape, int8 + scale
        _quant_assign_fn(spark, cent),
        schema="vec_id long, cell long, embedding array<tinyint>, scale double",
    ).persist(StorageLevel.MEMORY_ONLY)
    qassigned.count()
    out["assigned_int8_mb"] = round((_cached_bytes(spark) - base) / 1e6, 1)
    qassigned.unpersist(blocking=True)
    out["shrink_x"] = round(
        out["assigned_float_mb"] / max(out["assigned_int8_mb"], 0.1), 2
    )

    # downstream A/B wall: full semantic_dedup both ways (same planted
    # corpus, same centroids), survivor counts must agree.  One untimed
    # warm-up each, then timed — alternating order so neither side
    # banks the JVM warm-up.
    from knovexlite_spark.ops.cluster import semantic_dedup

    def run_float():
        return semantic_dedup(
            big, k=16, threshold=0.99, centroids=cent, probes=2
        ).filter(F.col("doc") == F.col("component")).count()

    def run_int8():
        return semantic_dedup(
            qbig, k=16, threshold=0.99, centroids=cent, probes=2,
            quantized=True,
        ).filter(F.col("doc") == F.col("component")).count()

    run_float(), run_int8()  # warm-up, untimed
    t0 = time.time()
    b = run_int8()
    out["semdedup_int8_sec"] = round(time.time() - t0, 2)
    t0 = time.time()
    a = run_float()
    out["semdedup_float_sec"] = round(time.time() - t0, 2)
    out["survivors_float"] = a
    out["survivors_int8"] = b
    print(json.dumps(out))


def _quant_assign_fn(spark, cent):
    import numpy as np
    import pandas as pd

    b_c = spark.sparkContext.broadcast(cent.astype("float32"))

    def assign(it):
        c = b_c.value
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
            real = mat * pdf["scale"].to_numpy()[:, None].astype(np.float32)
            d = ((real[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": np.argmin(d, axis=1).astype(np.int64),
                    "embedding": pdf["embedding"],
                    "scale": pdf["scale"],
                }
            )

    return assign


if __name__ == "__main__":
    main()
