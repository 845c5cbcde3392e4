"""EFO correctness corpus (SURVEY.md §2.10 CQ1-CQ8 + flagship CQ9).

Each query runs through the REAL engine path — lstr parse -> NNF/DNF ->
DataFrame join plan over the pair-encoded, inverse-augmented triples
view — and is checked against plain-SQL joins in DuckDB.

Relation encoding over the bridge view (FIXTURES.md §B1), pair-encoded
so inverse(r) = r XOR 1:

    placed       cust->order   base 0 -> aug 0 (inv 1)
    contains     order->part   base 1 -> aug 2 (inv 3)
    supplied_by  order->supp   base 2 -> aug 4 (inv 5)
    from_nation  supp->nation  base 3 -> aug 6 (inv 7)
    cust_nation  cust->nation  base 4 -> aug 8 (inv 9)

Pinned constants (FIXTURES.md): s1 = MIN(c_custkey), s2 = second
smallest c_custkey, x = 2000000 + MIN(p_partkey).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine
from knovexlite_spark.kg.triples import pair_encode_inverse
from knovexlite_spark.plans.exact import answer_exact

PLACED, CONTAINS, SUPPLIED_BY, FROM_NATION, CUST_NATION = 0, 2, 4, 6, 8

# name -> (lstr, relation bindings, which pinned constants the s* need)
CQ_DEFS: dict[str, tuple[str, dict[str, int], dict[str, str]]] = {
    # CQ1 1p: orders placed by s1 (single equi-join J1)
    "cq1_1p": ("r1(s1,f)", {"r1": PLACED}, {"s1": "s1"}),
    # CQ2 2p: parts contained in s1's orders (chain join, ∃-projection)
    "cq2_2p": ("r1(s1,e1)&r2(e1,f)", {"r1": PLACED, "r2": CONTAINS}, {"s1": "s1"}),
    # CQ3 3p: nations of suppliers of s1's orders
    "cq3_3p": (
        "r1(s1,e1)&r2(e1,e2)&r3(e2,f)",
        {"r1": PLACED, "r2": SUPPLIED_BY, "r3": FROM_NATION},
        {"s1": "s1"},
    ),
    # CQ4 2i: common nations of s1 and s2 (intersection)
    "cq4_2i": (
        "r1(s1,f)&r2(s2,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ5 2in: s1's nations that are not s2's (atomic negation / anti join)
    "cq5_2in": (
        "r1(s1,f)&!r2(s2,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ6 2u: union of nations (DNF branches)
    "cq6_2u": (
        "r1(s1,f)|r2(s2,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ7 pi-shaped composition: suppliers' nations of s1's orders that
    # are also s2's nation (join + intersect)
    "cq7_pi": (
        "r1(s1,e1)&r2(e1,e2)&r3(e2,f)&r4(s2,f)",
        {"r1": PLACED, "r2": SUPPLIED_BY, "r3": FROM_NATION, "r4": CUST_NATION},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ8 inverse relation: orders that contain part x (backward edge,
    # answered forward over the XOR-augmented view; G4/E8)
    "cq8_inverse": ("r1(s1,f)", {"r1": CONTAINS ^ 1}, {"s1": "x"}),
    # CQ10 3i: common nation of three customers (3-way intersection)
    "cq10_3i": (
        "r1(s1,f)&r2(s2,f)&r3(s3,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION, "r3": CUST_NATION},
        {"s1": "s1", "s2": "s2", "s3": "s3"},
    ),
    # CQ11 up: parts contained in orders of s1 OR s2 (disjunction under
    # an existential chain — DNF produces two join branches)
    "cq11_up": (
        "(r1(s1,e1)|r2(s2,e1))&r3(e1,f)",
        {"r1": PLACED, "r2": PLACED, "r3": CONTAINS},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ12 inp: suppliers from s1's nation, unless that nation is also
    # s2's (negation on the existential variable; r3 is the inverse
    # from_nation edge nation->supplier)
    "cq12_inp": (
        "r1(s1,e1)&!r2(s2,e1)&r3(e1,f)",
        {"r1": CUST_NATION, "r2": CUST_NATION, "r3": FROM_NATION ^ 1},
        {"s1": "s1", "s2": "s2"},
    ),
    # CQ13 2il: nations of s1 that have at least one supplier (the
    # second atom's existential e1 is otherwise unconstrained — pins the
    # leaf domain-expansion semantics A14 at the gate)
    "cq13_2il": (
        "r1(s1,f)&r2(e1,f)",
        {"r1": CUST_NATION, "r2": FROM_NATION},
        {"s1": "s1"},
    ),
    # CQ9 flagship, anchor-free: customers whose orders are supplied by a
    # supplier from the customer's own nation (cyclic join, no constants)
    "cq9_samenation": (
        "r1(f,e1)&r2(e1,e2)&r3(e2,e3)&r4(f,e3)",
        {"r1": PLACED, "r2": SUPPLIED_BY, "r3": FROM_NATION, "r4": CUST_NATION},
        {},
    ),
}

# DuckDB oracles, written as plain joins over the driver's base views —
# deliberately NOT the engine's plan shape.
_S1 = "(SELECT MIN(c_custkey) FROM customer)"
_S2 = f"(SELECT MIN(c_custkey) FROM customer WHERE c_custkey > {_S1})"

CQ_ORACLE: dict[str, str] = {
    "cq1_1p": f"""
        SELECT DISTINCT 1000000 + o_orderkey AS f
        FROM orders WHERE o_custkey = {_S1}
    """,
    "cq2_2p": f"""
        SELECT DISTINCT 2000000 + l_partkey AS f
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE o_custkey = {_S1}
    """,
    "cq3_3p": f"""
        SELECT DISTINCT CAST(4000000 + s_nationkey AS BIGINT) AS f
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE o_custkey = {_S1}
    """,
    "cq4_2i": f"""
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S1}
        INTERSECT
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S2}
    """,
    "cq5_2in": f"""
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S1}
        EXCEPT
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S2}
    """,
    "cq6_2u": f"""
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S1}
        UNION
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S2}
    """,
    "cq7_pi": f"""
        SELECT DISTINCT CAST(4000000 + s_nationkey AS BIGINT) AS f
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE o_custkey = {_S1}
        INTERSECT
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S2}
    """,
    "cq8_inverse": """
        SELECT DISTINCT 1000000 + l_orderkey AS f
        FROM lineitem WHERE l_partkey = (SELECT MIN(p_partkey) FROM part)
    """,
    "cq10_3i": f"""
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S1}
        INTERSECT
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer WHERE c_custkey = {_S2}
        INTERSECT
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f FROM customer
        WHERE c_custkey = (SELECT MIN(c_custkey) FROM customer
                           WHERE c_custkey > {_S2})
    """,
    "cq11_up": f"""
        SELECT DISTINCT 2000000 + l_partkey AS f
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_custkey = {_S1}
            UNION
            SELECT o_orderkey FROM orders WHERE o_custkey = {_S2}
        )
    """,
    "cq12_inp": f"""
        SELECT DISTINCT CAST(3000000 + s_suppkey AS BIGINT) AS f
        FROM supplier
        JOIN customer c1 ON c1.c_custkey = {_S1} AND s_nationkey = c1.c_nationkey
        WHERE s_nationkey NOT IN (
            SELECT c_nationkey FROM customer WHERE c_custkey = {_S2}
        )
    """,
    "cq13_2il": f"""
        SELECT CAST(4000000 + c_nationkey AS BIGINT) AS f
        FROM customer
        WHERE c_custkey = {_S1}
          AND c_nationkey IN (SELECT s_nationkey FROM supplier)
    """,
    "cq9_samenation": """
        SELECT DISTINCT c_custkey AS f
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE s_nationkey = c_nationkey
    """,
}


def _pinned_constants(engine: Engine) -> dict[str, int]:
    """FIXTURES.md pinned constants, computed once per sf_dir (driver-side
    scalars — this is query parameter binding, not data movement).
    Memoized on the engine."""
    if engine._scalars:
        return engine._scalars
    cust = engine.table("customer")
    rows = cust.select("c_custkey").orderBy("c_custkey").limit(3).collect()
    s1, s2, s3 = rows[0][0], rows[1][0], rows[2][0]
    x = 2_000_000 + engine.table("part").agg(F.min("p_partkey")).collect()[0][0]
    engine._scalars = {"s1": int(s1), "s2": int(s2), "s3": int(s3), "x": int(x)}
    return engine._scalars


def _answer(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    lstr, rel_bindings, const_map = CQ_DEFS[name]
    engine = Engine.for_dir(spark, sf_dir)
    pinned = _pinned_constants(engine)
    bindings = dict(rel_bindings)
    for sym, key in const_map.items():
        bindings[sym] = pinned[key]
    aug = pair_encode_inverse(engine.triples)
    return answer_exact(aug, lstr, bindings)


def _runner(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _answer(spark, sf_dir, name)

    return run


# The driver records at most 50 gate rows (round-1 forensics), so related
# query types share a row: each group unions its members' answer frames
# under a ``q`` tag; the oracle is the matching tagged UNION ALL.  Every
# one of the 13 CQ types still runs through the full engine path.
CQ_GROUPS: dict[str, list[str]] = {
    "cq_paths": ["cq1_1p", "cq2_2p", "cq3_3p", "cq8_inverse"],
    "cq_intersections": ["cq4_2i", "cq10_3i", "cq13_2il"],
    "cq_unions": ["cq6_2u", "cq11_up"],
    "cq_negations": ["cq5_2in", "cq12_inp"],
    "cq7_pi": ["cq7_pi"],
    "cq9_samenation": ["cq9_samenation"],
}

# every CQ type must belong to exactly one gate row — a type added to
# CQ_DEFS but not grouped would silently vanish from the driver surface
# (the precise failure mode the 50-cap consolidation guards against).
# A hard raise, not `assert`: asserts are stripped under python -O,
# which would silently re-enable the failure mode (round-2 advisor).
_grouped = [m for members in CQ_GROUPS.values() for m in members]
if sorted(_grouped) != sorted(CQ_DEFS):
    raise RuntimeError(
        f"CQ_GROUPS must partition CQ_DEFS: "
        f"missing={set(CQ_DEFS) - set(_grouped)}, stale={set(_grouped) - set(CQ_DEFS)}"
    )


def _group_runner(members: list[str]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        frames = [
            _answer(spark, sf_dir, m).select(
                F.lit(m).alias("q"), F.col("f").cast("long").alias("f")
            )
            for m in members
        ]
        out = frames[0]
        for fr in frames[1:]:
            out = out.unionAll(fr)
        return out

    return run


def _group_oracle(members: list[str]) -> str:
    return "\nUNION ALL\n".join(
        f"SELECT '{m}' AS q, CAST(f AS BIGINT) AS f FROM ({CQ_ORACLE[m]}) _{m}"
        for m in members
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for gname, members in CQ_GROUPS.items():
        if len(members) == 1:
            out[gname] = _runner(members[0])
        else:
            out[gname] = _group_runner(members)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for gname, members in CQ_GROUPS.items():
        if len(members) == 1:
            out[gname] = CQ_ORACLE[members[0]]
        else:
            out[gname] = _group_oracle(members)
    return out
