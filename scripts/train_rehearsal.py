"""Scale rehearsal for the KGE training step (round-4 verdict ask #8).

The parameter-server claim under test: ``train_step``'s only shuffle is
the combinable ``groupBy(kind, id, dim)`` over gradient contributions,
so the bytes that cross the wire are O(params) = O(|entities| * dim),
NOT O(contrib rows) = O(|triples| * (3 + negatives) * dim).  Map-side
partial aggregation collapses each task's contributions to at most
|touched params| partial sums before the exchange.

This script measures it rather than asserting it: it runs one TransE
``train_step`` over the bridge triples at sf0.1 and at the K-fold
blow-up (built by scale_rehearsal.py, reused if present), with the
Spark UI enabled so the REST status API can report actual
shuffle-write records/bytes for the step's stages.  It prints one JSON
line with, per corpus: triple count, entity count, contrib rows
(analytic: n_triples * (3 + negatives) * dim), measured shuffle write
records/bytes, and wall time.

Usage: python scripts/train_rehearsal.py [K] [blowup_dir]
(defaults K=6, dir=/tmp/sf_blowup_6x; builds the blow-up if absent)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knovexlite_spark.engine import Engine
from knovexlite_spark.functions.kge import EmbeddingStore, TransE
from knovexlite_spark.functions.oracle import densify_entities
from knovexlite_spark.reasoner.train import train_step
from knovexlite_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DIM = 8
# TRAIN_NEG sweeps the negative-sample count: contrib rows scale with
# (3 + negatives) while the combinable shuffle saturates at
# tasks x touched-params — the saturation IS the O(params) evidence.
NEGATIVES = int(os.environ.get("TRAIN_NEG", "2"))
# TRAIN_ONLY=base skips the blow-up run (for the negatives sweep).
ONLY_BASE = os.environ.get("TRAIN_ONLY") == "base"


def _rest_shuffle_totals(spark) -> tuple[int, int]:
    """(records, bytes) shuffle-written across all completed stages."""
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.loads(r.read())
    recs = sum(s.get("shuffleWriteRecords", 0) for s in stages)
    byts = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    return recs, byts


def measure(spark, sf_dir: str) -> dict:
    eng = Engine.for_dir(spark, sf_dir)
    mapping, dense = densify_entities(eng.triples)
    dense = dense.cache()
    n_entities = int(mapping.count())
    n_triples = int(dense.count())  # also materializes the cache
    store = EmbeddingStore.xavier(n_entities, 5, DIM, seed=7)

    r0, b0 = _rest_shuffle_totals(spark)
    t0 = time.time()
    res = train_step(
        dense, TransE(), store, lr=0.05, gamma=2.0,
        num_negatives=NEGATIVES, seed=3,
    )
    wall = time.time() - t0
    r1, b1 = _rest_shuffle_totals(spark)
    dense.unpersist()

    params = n_entities * DIM + 5 * DIM
    contrib_rows = n_triples * (3 + NEGATIVES) * DIM
    return {
        "triples": n_triples,
        "entities": n_entities,
        "params": params,
        "contrib_rows": contrib_rows,
        "shuffle_write_records": r1 - r0,
        "shuffle_write_mb": round((b1 - b0) / 1e6, 1),
        "records_vs_contribs": round((r1 - r0) / contrib_rows, 4),
        "wall_s": round(wall, 2),
        "loss": round(res.loss, 6),
    }


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    dst = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sf_blowup_{k}x"
    spark = get_spark(
        app_name="train_rehearsal",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4057"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(dst):
        from scale_rehearsal import build_blowup

        k = build_blowup(spark, k, dst)
        print(f"blow-up x{k} written to {dst}", file=sys.stderr)

    out = {"metric": "train_step_rehearsal", "dim": DIM, "negatives": NEGATIVES,
           "blowup": k, "base": measure(spark, SRC)}
    if not ONLY_BASE:
        out["blowup_run"] = measure(spark, dst)
        b, B = out["base"], out["blowup_run"]
        out["triples_ratio"] = round(B["triples"] / b["triples"], 2)
        out["wall_ratio"] = round(B["wall_s"] / b["wall_s"], 2)
        out["shuffle_records_ratio"] = round(
            B["shuffle_write_records"] / max(b["shuffle_write_records"], 1), 2
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
