"""Graph functionals G1-G3 vs hand-computed results + bridge-graph BFS."""

from knovexlite_spark.engine import Engine
from knovexlite_spark.ops.graph import bfs_layers, propagate, topological_order
from tests.conftest import SF_SMALL

# diamond with a tail: 0->1, 0->2, 1->3, 2->3, 3->4
EDGES = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]


def _edges(spark):
    return spark.createDataFrame(EDGES, "h long, t long")


def _nodes(spark):
    return spark.createDataFrame([(i,) for i in range(5)], "node long")


def test_propagate_one_step(spark):
    fr = spark.createDataFrame([(0,)], "node long")
    out = {r["node"] for r in propagate(fr, _edges(spark)).collect()}
    assert out == {1, 2}
    back = {r["node"] for r in propagate(fr, _edges(spark), "backward").collect()}
    assert back == set()


def test_bfs_layers(spark):
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {r["node"]: r["layer"] for r in bfs_layers(seeds, _edges(spark)).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_order(spark):
    got = {r["node"]: r["topo_layer"] for r in topological_order(_nodes(spark), _edges(spark)).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_order_cycle_residue(spark):
    edges = spark.createDataFrame(EDGES + [(4, 0)], "h long, t long")  # cycle
    got = {r["node"]: r["topo_layer"] for r in topological_order(_nodes(spark), edges).collect()}
    assert all(v == -1 for v in got.values())  # whole graph cyclic now


def test_bfs_on_bridge_graph(spark):
    """3 hops from a customer reach exactly the §B1 schema neighborhoods:
    orders(1), parts+suppliers(2), nations(3)."""
    eng = Engine(spark, SF_SMALL)
    edges = eng.triples.select("h", "t")
    c0 = eng.table("customer").selectExpr("MIN(c_custkey) AS node")
    layers = bfs_layers(c0, edges, max_depth=3).collect()
    by_layer = {}
    for r in layers:
        by_layer.setdefault(r["layer"], []).append(r["node"])
    # layer 1 = the customer's orders plus its own nation (direct edge)
    assert all(
        1_000_000 <= n < 2_000_000 or n >= 4_000_000 for n in by_layer[1]
    )
    assert all(2_000_000 <= n < 4_000_000 for n in by_layer[2])  # parts+supps
    # layer 3 (if present): supplier nations not already seen at layer 1
    assert all(n >= 4_000_000 for n in by_layer.get(3, []))
