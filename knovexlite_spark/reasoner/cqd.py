"""CQD beam search over DataFrames (SURVEY §2.7 R1, §3 entry point 2).

Reference parity: ``CQDBeam.eval_all_entity_scores`` →
``recursive_beam_search``
(/root/reference/knovex/reasoner/cqd.py:82-431): backward recursion from
the free variable to constants with a visited-mask cycle guard
(cqd.py:134-145); per level —

  frontier scoring   J2  score every (source-assignment, rel) vs all
                         tails  (cqd.py:221-249) -> broadcast mat-mul
                         kernel, never a row cross-join
  combine            sum  source score + edge score = log-space product
                         t-norm (cqd.py:319-320) -> `acc_col` addition
  ∃-elimination      A1  max over source beam per (edge, tail)
                         (cqd.py:327-338) -> groupBy(t).max
  conjunction        A2  sum across incoming edges per tail
                         (cqd.py:344-355) -> union + groupBy(t).sum
  beam prune         A7  top-k per variable (cqd.py:374-409)
                         -> orderBy desc limit k

Exactness note (faithful to the reference): max-sum variable elimination
is exact on tree-shaped query graphs; on multi-edge/cyclic shapes
(2m, 3c, ...) the per-edge max is the same approximation the reference
makes.  The §5.4 oracle-KGE test pins the tree types.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.functions.kge import EmbeddingStore, KGEModel, score_all_tails
from knovexlite_spark.language.ast import ConjunctiveClause
from knovexlite_spark.language.normalize import dnf_conjuncts
from knovexlite_spark.language.parser import parse_lstr


@dataclass
class _Edge:
    src: str  # term name
    dst: str
    rel: int
    negated: bool


@dataclass
class CQDBeam:
    """One reasoner per (model, store); beam_size as in cqd.py:37-42."""

    model: KGEModel
    store: EmbeddingStore
    beam_size: int = 10
    tnorm: str = "product"  # sum of scores == log-space product

    def scores_for_clause(
        self,
        spark: SparkSession,
        clause: ConjunctiveClause,
        bindings: dict[str, int],
        free_var: str = "f",
    ) -> DataFrame:
        """Dense (t, score) over all entities for the free variable."""
        edges = self._oriented_edges(clause, bindings)
        visited: set[str] = set()
        cache: dict[str, DataFrame] = {}
        n = self.store.ent.shape[0]

        def recurse(target: str, prune: bool) -> DataFrame:
            if target in cache:
                return cache[target]
            visited.add(target)
            active = [
                e for e in edges if e.dst == target and e.src not in visited
            ]
            # (constant sources are never 'visited'; they terminate)
            edge_frames: list[DataFrame] = []
            for e in active:
                if e.src.startswith("s"):
                    src_df = spark.createDataFrame(
                        [(int(bindings[e.src]), 0.0)], schema="h long, acc double"
                    )
                else:
                    src_df = (
                        recurse(e.src, prune=True)
                        .withColumnRenamed("t", "h")
                        .withColumnRenamed("score", "acc")
                    )
                scored = score_all_tails(
                    src_df.select(
                        "h",
                        F.lit(e.rel).alias("r"),
                        F.lit(e.negated).alias("neg"),
                        "acc",
                    ),
                    self.model,
                    self.store,
                    acc_col="acc",
                    neg_col="neg",
                )
                # A1: ∃-eliminate the source beam per tail
                edge_frames.append(scored.groupBy("t").agg(F.max("score").alias("score")))

            if not edge_frames:
                # unconstrained existential leaf: whole domain, score 0
                # (log-space 1), no pruning — early return as in
                # cqd.py:147-164
                out = spark.range(n).select(
                    F.col("id").alias("t"), F.lit(0.0).alias("score")
                )
                cache[target] = out
                return out
            # every edge frame is dense over all N tails (the kernel
            # scores the full domain), so the union-sum is well-formed
            out = edge_frames[0]
            for other in edge_frames[1:]:
                out = out.unionByName(other)
            # A2: conjunction = sum across incoming edges
            out = out.groupBy("t").agg(F.sum("score").alias("score"))
            if prune:
                out = out.orderBy(F.col("score").desc(), "t").limit(self.beam_size)
            out = out.localCheckpoint(eager=False)
            cache[target] = out
            return out

        return recurse(free_var, prune=False)

    def eval_all_entity_scores(
        self,
        spark: SparkSession,
        lstr: str,
        bindings: dict[str, int],
        free_var: str = "f",
    ) -> DataFrame:
        """Dense scores for the free variable; DNF disjuncts combine by
        max (fuzzy OR — SURVEY §3 step 7)."""
        frames = [
            self.scores_for_clause(spark, clause, bindings, free_var)
            for clause in dnf_conjuncts(parse_lstr(lstr))
        ]
        out = frames[0]
        for f_ in frames[1:]:
            out = out.unionByName(f_)
        return out.groupBy("t").agg(F.max("score").alias("score"))

    def _oriented_edges(
        self, clause: ConjunctiveClause, bindings: dict[str, int]
    ) -> list[_Edge]:
        """Both orientations of every atom, inverse relation = rel XOR 1
        (the reference applies add_inverse_edge to each query graph,
        utils/dataloader.py:32-61)."""
        edges: list[_Edge] = []
        for atom, negated in [(a, False) for a in clause.positive] + [
            (a, True) for a in clause.negative
        ]:
            rel = bindings[atom.relation]
            h, t = atom.head.name, atom.tail.name
            edges.append(_Edge(h, t, rel, negated))
            edges.append(_Edge(t, h, rel ^ 1, negated))
        return edges
