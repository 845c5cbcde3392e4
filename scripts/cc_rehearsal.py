"""Scale rehearsal for connected_components (ops/graph.py).

The gate exercises the operator on a 100-doc slice; this measures the
shape that matters — the full bridge KG (sf0.1: ~186k nodes / 1.37M
edges; 6x blow-up: ~1.1M / 8.2M) where the giant component forces the
pointer-jumping path to do real work.  Prints one JSON line per corpus
with node/edge counts, rounds to convergence, wall time, and the
component-count/size-of-largest summary (driver-side only as scalars).

Usage: python scripts/cc_rehearsal.py [blowup_dir]
(default /tmp/sf_blowup_6x if present; base always runs)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops.graph import connected_components
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def measure(spark, sf_dir: str) -> dict:
    eng = Engine.for_dir(spark, sf_dir)
    edges = eng.triples.select("h", "t")
    nodes = (
        edges.select(F.col("h").alias("node"))
        .unionByName(edges.select(F.col("t").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    n_edges = edges.count()
    t0 = time.time()
    comp = connected_components(nodes, edges)
    summary = comp.groupBy("component").count()
    n_comp, largest = summary.agg(
        F.count("*"), F.max("count")
    ).first()
    wall = time.time() - t0
    return {
        "sf_dir": sf_dir,
        "nodes": int(n_nodes),
        "edges": int(n_edges),
        "components": int(n_comp),
        "largest": int(largest),
        "wall_s": round(wall, 2),
    }


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_blowup_6x"
    spark = get_spark(app_name="cc_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "cc_rehearsal", "base": measure(spark, SRC)}
    if os.path.exists(dst):
        out["blowup_run"] = measure(spark, dst)
        out["wall_ratio"] = round(
            out["blowup_run"]["wall_s"] / out["base"]["wall_s"], 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
