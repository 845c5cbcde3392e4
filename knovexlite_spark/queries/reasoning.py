"""Reasoning-path correctness corpus: CQD beam search under the fact
oracle, checked against the SAME SQL oracles as the exact path.

Pipeline per query: bridge triples -> pair-encoded inverse augmentation
-> dense entity re-identification (KGIndex parity) -> CQD beam search
(broadcast-kernel scoring, groupBy max/sum, top-k prune) -> threshold at
n_positive_atoms -> map back to original ids.  With beam >= the true
intermediate candidate count, the result set equals exact semantics
(SURVEY §5.4), so DuckDB join SQL is a valid oracle for the whole
neural evaluation path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.functions.oracle import FactOracle, densify_entities, id_store
from knovexlite_spark.kg.triples import pair_encode_inverse
from knovexlite_spark.language.normalize import dnf_conjuncts
from knovexlite_spark.language.parser import parse_lstr
from knovexlite_spark.queries.efo import CQ_ORACLE, CUST_NATION, PLACED, CONTAINS, _pinned_constants
from knovexlite_spark.reasoner.cqd import CQDBeam

BEAM = 128

CQD_DEFS: dict[str, tuple[str, dict[str, int], dict[str, str], str]] = {
    # (lstr, relation bindings, constant pin map, matching SQL oracle)
    "cqd_1p": ("r1(s1,f)", {"r1": PLACED}, {"s1": "s1"}, "cq1_1p"),
    "cqd_2p": (
        "r1(s1,e1)&r2(e1,f)",
        {"r1": PLACED, "r2": CONTAINS},
        {"s1": "s1"},
        "cq2_2p",
    ),
    "cqd_2i": (
        "r1(s1,f)&r2(s2,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
        "cq4_2i",
    ),
    "cqd_2in": (
        "r1(s1,f)&!r2(s2,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
        "cq5_2in",
    ),
}


def _runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    lstr, rel_bindings, const_map, _ = CQD_DEFS[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        engine = Engine(spark, sf_dir)
        pinned = _pinned_constants(engine)
        aug = pair_encode_inverse(engine.triples)
        mapping, dense = densify_entities(aug)
        mapping = mapping.cache()
        num_entities = mapping.count()
        num_relations = 10

        # model parameters: the fact set (see FactOracle scale note)
        facts = [(r["h"], r["r"], r["t"]) for r in dense.collect()]
        model = FactOracle.from_facts(facts, num_entities)
        store = id_store(num_entities, num_relations)

        bindings = dict(rel_bindings)
        dense_of = {
            r["orig"]: r["dense"]
            for r in mapping.filter(
                F.col("orig").isin([pinned[k] for k in const_map.values()])
            ).collect()
        }
        for sym, key in const_map.items():
            bindings[sym] = dense_of[pinned[key]]

        reasoner = CQDBeam(model=model, store=store, beam_size=BEAM)
        scores = reasoner.eval_all_entity_scores(spark, lstr, bindings)
        n_pos = max(
            len(c.positive) for c in dnf_conjuncts(parse_lstr(lstr))
        )
        answers = scores.filter(F.col("score") >= n_pos - 1e-9).select(
            F.col("t").alias("dense")
        )
        return answers.join(mapping, "dense").select(F.col("orig").alias("f"))

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _runner(name) for name in CQD_DEFS}


def oracle_sql() -> dict[str, str]:
    return {name: CQ_ORACLE[spec[3]] for name, spec in CQD_DEFS.items()}
