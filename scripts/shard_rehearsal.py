"""Scale rehearsal for entity-axis sharded all-tails scoring
(round-6 verdict ask #3).

``score_all_tails_sharded`` is the declared answer past the
whole-matrix broadcast ceiling (~25 GB at 100M x 64 float32), but
round 5 shipped it equivalence-tested with no measured row, and its
eager mode ran shards as STRICTLY SEQUENTIAL jobs.  This script
measures, at an entity matrix large enough to force >= 4 real shards:

- the single-broadcast grouped-max path (the below-ceiling baseline),
- sharded eager with overlap = 1 (serial jobs), 2, and 4 concurrent
  shard jobs (driver-thread multi-job submission),

reporting wall time and the Spark REST executor peak JVM memory
(peakMemoryMetrics.JVMHeapMemory; OnHeapExecutionMemory where
exposed) around each run, plus the analytic slice-residency bound
(overlap x slice bytes) that the ``overlap`` knob trades against
throughput.

The memory story to check: serial shards hold <= 1 slice resident but
idle the cluster during each job's tail; overlap k holds <= k slices.
The matrix here (N x dim float32) is sized so slices are tens of MB —
big enough that residency is visible in executor peaks, small enough
for local[32].

Usage: python scripts/shard_rehearsal.py [n_entities] [dim] [n_queries]
(defaults 400000 x 64, 96 candidate rows -> 4 shards of ~25 MB)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from knovexlite_spark.functions.kge import (  # noqa: E402
    EmbeddingStore,
    TransE,
    score_all_tails_grouped_max,
    score_all_tails_sharded,
)
from knovexlite_spark.session import get_spark  # noqa: E402

N_ENT = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
DIM = int(sys.argv[2]) if len(sys.argv) > 2 else 64
N_QUERIES = int(sys.argv[3]) if len(sys.argv) > 3 else 96
N_SHARDS = 4
N_REL = 8


def _executor_peaks(spark) -> dict:
    """Max over executors of the REST peakMemoryMetrics (driver row
    included — in local mode it IS the executor)."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/executors"
    try:
        with urllib.request.urlopen(url, timeout=10) as r:
            execs = json.loads(r.read())
    except Exception:
        return {}
    peaks: dict[str, int] = {}
    for e in execs:
        for k, v in (e.get("peakMemoryMetrics") or {}).items():
            peaks[k] = max(peaks.get(k, 0), int(v))
    keep = ("JVMHeapMemory", "OnHeapExecutionMemory", "OnHeapStorageMemory")
    return {k: round(peaks[k] / 1e6, 1) for k in keep if k in peaks}


def main() -> None:
    spark = get_spark(
        app_name="shard_rehearsal",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4058",
            # poll executor metrics frequently so short runs register
            # their broadcast-residency peaks
            "spark.executor.metrics.pollingInterval": "250ms",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # spin the Python/Arrow worker pool + codegen outside timed windows
    spark.range(0, 64, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    store = EmbeddingStore.xavier(N_ENT, N_REL, ent_dim=DIM, seed=17)
    ent_mb = store.ent.nbytes / 1e6
    slice_mb = ent_mb / N_SHARDS

    rng = np.random.default_rng(5)
    rows = [
        (int(q), int(rng.integers(0, N_ENT)), int(rng.integers(0, N_REL)))
        for q in range(N_QUERIES)
    ]
    df = spark.createDataFrame(rows, "query_id long, h long, r long").repartition(32)
    df = df.localCheckpoint(eager=True)  # inputs off the timed path

    from pyspark.sql import functions as F

    def run(name, fn):
        t0 = time.time()
        out = fn().groupBy("query_id", "t").agg(F.max("score").alias("s"))
        # checksum forces full execution and pins equivalence across modes
        row = out.agg(
            F.count("*").alias("n"), F.sum(F.round("s", 3)).alias("chk")
        ).collect()[0]
        wall = round(time.time() - t0, 2)
        return {
            "mode": name,
            "wall_s": wall,
            "rows": int(row["n"]),
            "chk": round(float(row["chk"]), 1),
            "executor_peaks_mb": _executor_peaks(spark),
        }

    # SHARD_MODES selects a subset (comma-sep).  The REST executor
    # peaks are MONOTONE over the app lifetime, so per-mode peak
    # attribution requires one process per mode — run e.g.
    #   for m in single_broadcast sharded_overlap1 sharded_overlap4; do
    #     SHARD_MODES=$m python scripts/shard_rehearsal.py; done
    # for the memory comparison; the default all-in-one run still
    # gives comparable WALL times (shared warm-up).
    all_modes = {
        "single_broadcast": lambda: score_all_tails_grouped_max(
            df, TransE(), store
        ),
        # round-7 wiring: the int8 broadcast path — 4x smaller
        # broadcast payload (reported below), GEMM unchanged after the
        # once-per-worker dequantize; checksum differs from float by
        # the quantization error only (rows must match)
        "single_broadcast_int8": lambda: score_all_tails_grouped_max(
            df, TransE(), store, quantized=True
        ),
    }
    for overlap in (1, 2, 4):
        all_modes[f"sharded_overlap{overlap}"] = (
            lambda overlap=overlap: score_all_tails_sharded(
                df, TransE(), store, n_shards=N_SHARDS, overlap=overlap
            )
        )
    all_modes["sharded_overlap2_int8"] = lambda: score_all_tails_sharded(
        df, TransE(), store, n_shards=N_SHARDS, overlap=2, quantized=True
    )
    selected = os.environ.get("SHARD_MODES")
    modes = (
        {k: all_modes[k] for k in selected.split(",")} if selected else all_modes
    )
    results = [run(name, fn) for name, fn in modes.items()]

    print(
        json.dumps(
            {
                "n_entities": N_ENT,
                "dim": DIM,
                "n_queries": N_QUERIES,
                "n_shards": N_SHARDS,
                "ent_matrix_mb": round(ent_mb, 1),
                "slice_mb": round(slice_mb, 1),
                "ent_matrix_int8_mb": round(
                    sum(a.nbytes for a in store.ent_quantized()) / 1e6, 1
                ),
                "runs": results,
            }
        )
    )


if __name__ == "__main__":
    main()
