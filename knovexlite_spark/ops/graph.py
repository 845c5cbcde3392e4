"""Generic graph functionals (SURVEY §2.8 G1-G3).

Reference parity: /root/reference/knovex/utils/pyg_graph_functionals.py —
mask propagation (27-56), BFS layers (59-82), topological order
(85-117) — re-expressed as DataFrame join loops (the GraphX/Pregel
aggregateMessages pattern: a frontier join per superstep).

Scale notes: each BFS level is one equi-join frontier ⋈ edges plus a
distinct.  The frontier side carries an EXPLICIT broadcast hint by
default (``small_frontier=True``): frontier frames come from
createDataFrame/localCheckpoint and carry no stats, so without the
hint Spark plans a SortMergeJoin that SHUFFLES THE WHOLE EDGE SET per
superstep — and AQE cannot save the cost, because by the time runtime
stats exist the edge shuffle has already run (measured round 4: 2 SMJ,
0 broadcasts on a 1-node frontier against 2.7M edges).  Pass
``small_frontier=False`` for expander-scale frontiers that would not
fit a broadcast.  ``localCheckpoint`` per level truncates the
iterative lineage (SURVEY §4.2).  Iteration count is bounded by graph
diameter, the standard Pregel assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def propagate(
    frontier: DataFrame,
    edges: DataFrame,
    direction: str = "forward",
    small_frontier: bool = True,
) -> DataFrame:
    """G1: one-step neighbor expansion.  frontier: (node); edges:
    (h, t [, r])."""
    if direction == "forward":
        src, dst = "h", "t"
    elif direction == "backward":
        src, dst = "t", "h"
    else:
        raise ValueError(direction)
    f = frontier.withColumnRenamed("node", src)
    if small_frontier:
        f = F.broadcast(f)
    return (
        f.join(edges.select(src, dst), src)
        .select(F.col(dst).alias("node"))
        .distinct()
    )


def bfs_layers(
    seeds: DataFrame,
    edges: DataFrame,
    max_depth: int = 20,
    direction: str = "forward",
    small_frontier: bool = True,
) -> DataFrame:
    """G2: BFS level sets — (node, layer), layer 0 = seeds.  Repeated G1
    with visited-set subtraction; terminates on empty frontier or
    max_depth."""
    visited = seeds.select("node").distinct().withColumn("layer", F.lit(0))
    frontier = visited.select("node")
    for depth in range(1, max_depth + 1):
        nxt = (
            propagate(frontier, edges, direction, small_frontier=small_frontier)
            .join(visited.select("node"), "node", "left_anti")
            .distinct()
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt.withColumn("layer", F.lit(depth)))
        frontier = nxt
    return visited


def topological_order(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 100,
    small_layer: bool = True,
) -> DataFrame:
    """G3: Kahn frontier elimination — (node, topo_layer).  Each round
    removes the current zero-in-degree set; cycles leave a non-empty
    residue, reported with topo_layer = -1.

    Unlike a BFS frontier, a Kahn layer is not diameter-bounded — in a
    wide/shallow DAG the first layer (every zero-in-degree node) can be
    nearly the whole node set.  ``small_layer=False`` drops the
    broadcast hint for such graphs, mirroring ``small_frontier``."""
    remaining_nodes = nodes.select("node").distinct().localCheckpoint()
    remaining_edges = edges.select("h", "t").localCheckpoint()
    out = None
    for layer in range(max_iter):
        with_preds = remaining_edges.select(F.col("t").alias("node")).distinct()
        zero_in = remaining_nodes.join(with_preds, "node", "left_anti").localCheckpoint()
        if zero_in.isEmpty():
            break
        tagged = zero_in.withColumn("topo_layer", F.lit(layer))
        out = tagged if out is None else out.unionByName(tagged)
        # zero_in is one layer (usually small); hint it so the anti-joins
        # build a broadcast hash set instead of shuffling nodes+edges per
        # round — unless the caller declared layers broadcast-unsafe
        layer_df = F.broadcast(zero_in) if small_layer else zero_in
        layer_as_h = (
            F.broadcast(zero_in.withColumnRenamed("node", "h"))
            if small_layer
            else zero_in.withColumnRenamed("node", "h")
        )
        remaining_nodes = remaining_nodes.join(
            layer_df, "node", "left_anti"
        ).localCheckpoint()
        remaining_edges = (
            remaining_edges.join(layer_as_h, "h", "left_anti").localCheckpoint()
        )
    if out is None:
        out = remaining_nodes.withColumn("topo_layer", F.lit(-1)).limit(0)
    cyclic = remaining_nodes.join(out.select("node"), "node", "left_anti").withColumn(
        "topo_layer", F.lit(-1)
    )
    return out.unionByName(cyclic)


def connected_reachability(
    seeds: DataFrame, edges: DataFrame, max_depth: int = 20
) -> DataFrame:
    """Reachable set from seeds over undirected edges (both directions) —
    the G1/G2 composition used for component probing."""
    undirected = edges.select("h", "t").unionByName(
        edges.select(F.col("t").alias("h"), F.col("h").alias("t"))
    )
    return bfs_layers(seeds, undirected, max_depth, "forward")
