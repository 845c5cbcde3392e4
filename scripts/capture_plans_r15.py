"""Capture `.explain("formatted")` for named bench rows into
plans/r15/<name>_<tag>.txt (the round-15 optimization evidence files).

Usage: python scripts/capture_plans_r15.py <tag> [row ...]
  tag: 'before' | 'after'
  rows default to the round-15 optimization target set.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knovexlite_spark.session import get_spark  # noqa: E402

DEFAULT_ROWS = [
    "ts_resample",
    "ts_rolling",
    "pagerank",
    "gk_local_by_key",
    "semantic_dedup",
    "clf_score",
    "gk_quantile",
    "gk_by_key",
    "dedup_minhash",
    "substr_dedup",
    "ngram_ppl",
    "corpus_profile",
    "mg_heavy_hitters",
    "ts_ewma",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    rows = sys.argv[2:] or DEFAULT_ROWS
    sf_dir = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    spark = get_spark(app_name="capture_plans_r15", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    qs = bench.headline_queries()
    os.makedirs("plans/r15", exist_ok=True)
    for name in rows:
        if name not in qs:
            print(f"skip {name}: not a bench row")
            continue
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = f"plans/r15/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
