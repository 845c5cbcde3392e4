"""Exact EFO evaluation vs brute force on a tiny random KG — all 26
standard query types, random instances (SURVEY.md §5.3)."""

import random

import pytest

from knovexlite_spark.language.query import QUERY_TYPES
from knovexlite_spark.plans.exact import answer_exact
from tests.efo_bruteforce import answers_bruteforce, make_tiny_kg, sample_bindings

N_INSTANCES = 4


@pytest.fixture(scope="module")
def kg(spark):
    facts = make_tiny_kg()
    df = spark.createDataFrame(sorted(facts), schema="h LONG, r LONG, t LONG")
    df = df.cache()
    df.count()
    return facts, df


@pytest.mark.parametrize("name", sorted(QUERY_TYPES))
def test_exact_matches_bruteforce(kg, spark, name):
    facts, triples = kg
    lstr = QUERY_TYPES[name]
    rng = random.Random(hash(name) & 0xFFFF)
    n_nonempty = 0
    for _ in range(N_INSTANCES):
        bindings = sample_bindings(facts, lstr, rng)
        expected = answers_bruteforce(facts, lstr, bindings)
        got = {row["f"] for row in answer_exact(triples, lstr, bindings).collect()}
        assert got == expected, f"{name} bindings={bindings}"
        n_nonempty += bool(expected)
    # the sampler should produce at least one non-trivial instance
    # for the simple anchored types
    if name in ("1p", "2i", "2u"):
        assert n_nonempty > 0
