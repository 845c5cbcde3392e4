"""Scale rehearsal for pagerank (ops/graph.py).

The gate exercises the exact-integer twin for 2 steps; this measures
the float operator's real shape — 5 synchronous power steps on the
full bridge KG (sf0.1: ~186k nodes / 1.37M edges; 6x blow-up: ~1.1M /
8.2M) — and reports per-corpus wall, the per-step marginal (steps 5 ->
10 delta over 5, isolating the iteration cost from the one-time edge
materialization), and rank-mass summaries as scalars.

Usage: python scripts/pagerank_rehearsal.py [blowup_dir]
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
from knovexlite_spark.ops.graph import pagerank
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"


def measure(spark, sf_dir: str) -> dict:
    eng = Engine.for_dir(spark, sf_dir)
    edges = eng.triples.select("h", "t")
    n_edges = edges.count()

    def run(iters: int) -> tuple[float, float]:
        t0 = time.time()
        pr = pagerank(edges, iterations=iters)
        mass = pr.agg(F.sum("pr")).first()[0]
        return time.time() - t0, float(mass)

    wall5, mass5 = run(5)
    wall10, _ = run(10)
    return {
        "sf_dir": sf_dir,
        "edges": int(n_edges),
        "wall5_s": round(wall5, 2),
        "wall10_s": round(wall10, 2),
        "per_step_marginal_s": round((wall10 - wall5) / 5, 2),
        "rank_mass_5": round(mass5, 1),
    }


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_blowup_6x"
    spark = get_spark(app_name="pagerank_rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    out = {"metric": "pagerank_rehearsal", "base": measure(spark, SRC)}
    if os.path.exists(dst):
        out["blowup_run"] = measure(spark, dst)
        out["wall5_ratio"] = round(
            out["blowup_run"]["wall5_s"] / out["base"]["wall5_s"], 2
        )
        out["marginal_ratio"] = round(
            out["blowup_run"]["per_step_marginal_s"]
            / max(out["base"]["per_step_marginal_s"], 0.01),
            2,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
