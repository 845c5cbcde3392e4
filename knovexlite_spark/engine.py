"""Engine facade: session + registered views + SQL + EFO entry points.

The reference's lifecycle (SURVEY.md §3) is lstr -> AST -> DNF -> scored
evaluation; ours adds a full Spark SQL surface on the same session.  The
SQL path is a passthrough: Catalyst owns predicate pushdown, column
pruning, join reordering, AQE — we deliberately add no layer on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from knovexlite_spark.datasets import DEFAULT_SF_DIR, register_views
from knovexlite_spark.kg.triples import add_inverse_edges, build_triples_view
from knovexlite_spark.session import get_spark


class Engine:
    """One engine per (session, scale-factor dir)."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = DEFAULT_SF_DIR,
        register: bool = True,
    ):
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        self.tables: dict[str, DataFrame] = {}
        self.triples: DataFrame | None = None
        if register:
            self.tables = register_views(self.spark, sf_dir)
            self.triples = build_triples_view(self.spark)

    # -- relational surface ------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    # -- KG / EFO surface --------------------------------------------------

    def triples_with_inverses(self) -> DataFrame:
        """The XOR-augmented edge view (G4) the reference evaluates over."""
        assert self.triples is not None
        return add_inverse_edges(self.triples)

    def efo(self, lstr: str, bindings: dict[str, int], free_var: str = "f") -> DataFrame:
        """Answer an EFO query under exact set semantics: parse ->
        NNF/DNF -> per-conjunct join plan -> UNION (SURVEY §2.2-2.4).
        Returns a one-column DataFrame of entity ids for the free var."""
        from knovexlite_spark.plans.exact import answer_exact

        assert self.triples is not None
        return answer_exact(self.triples, lstr, bindings, free_var=free_var)
