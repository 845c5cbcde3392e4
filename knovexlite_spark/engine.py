"""Engine facade: session + registered views + SQL + EFO entry points.

The reference's lifecycle (SURVEY.md §3) is lstr -> AST -> DNF -> scored
evaluation; ours adds a full Spark SQL surface on the same session.  The
SQL path is a passthrough: Catalyst owns predicate pushdown, column
pruning, join reordering, AQE — we deliberately add no layer on top.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from knovexlite_spark.datasets import DEFAULT_SF_DIR, register_views
from knovexlite_spark.kg.triples import add_inverse_edges, build_triples_view
from knovexlite_spark.session import get_spark


class Engine:
    """One engine per (session, scale-factor dir)."""

    # Engines are cheap but not free (parquet footer reads, view
    # registration, pinned-constant collects); the driver runs dozens of
    # queries against one sf_dir, so cache per (session, sf_dir).
    # Keyed by WEAK reference to the session: an id()-keyed cache could
    # resurrect a stale engine bound to a dead session whose id was
    # reused by a new one (round-1 advisor finding).
    # Retention caveat (accepted): cached Engine values hold DataFrames
    # whose JVM plans reference the session, so an entry only collects
    # once both the session AND its engines are unreferenced; a stopped
    # session that the caller still (transitively) reaches via a cached
    # engine stays in the map.  Entries are small (plans, not data) and
    # one-session processes dominate, so we document rather than chase
    # full weakness (round-2 advisor finding).
    _cache: "weakref.WeakKeyDictionary[SparkSession, dict[str, Engine]]" = (
        weakref.WeakKeyDictionary()
    )
    _registered_dir: "weakref.WeakKeyDictionary[SparkSession, str]" = (
        weakref.WeakKeyDictionary()
    )

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = DEFAULT_SF_DIR,
        register: bool = True,
    ):
        # Held weakly: the cache maps session -> engine, and an engine
        # holding its session strongly would keep the weak cache key
        # alive forever (value -> key back-reference), defeating
        # collection of stopped sessions.
        self._spark_ref = weakref.ref(spark or get_spark())
        self.sf_dir = sf_dir
        self.tables: dict[str, DataFrame] = {}
        self.triples: DataFrame | None = None
        self._scalars: dict[str, int] = {}
        # The engine may receive a session it did not build (the driver
        # contract passes one in).  These are runtime-settable SQL confs
        # the engine's correctness depends on: nanos-timestamp parquet
        # reads, UTC timestamps (the DuckDB oracle runs UTC), Arrow
        # kernels, AQE.
        for k, v in (
            ("spark.sql.legacy.parquet.nanosAsLong", "true"),
            ("spark.sql.session.timeZone", "UTC"),
            ("spark.sql.execution.arrow.pyspark.enabled", "true"),
            ("spark.sql.adaptive.enabled", "true"),
        ):
            try:
                self.spark.conf.set(k, v)
            except Exception:  # noqa: BLE001 - conf may be static on some builds
                pass
        if register:
            self.tables = register_views(self.spark, sf_dir)
            self.triples = build_triples_view(self.spark)
            Engine._registered_dir[self.spark] = sf_dir

    @property
    def spark(self) -> SparkSession:
        s = self._spark_ref()
        if s is None:
            raise RuntimeError(
                "this Engine's SparkSession has been garbage-collected; "
                "create a new Engine with a live session"
            )
        return s

    @classmethod
    def for_dir(cls, spark: SparkSession, sf_dir: str) -> "Engine":
        """Cached engine; re-registers temp views only when the session
        last pointed at a different sf_dir.  DataFrames held by a cached
        engine stay bound to their files (views resolve at creation), so
        only the SQL-name surface needs refreshing."""
        per_session = cls._cache.get(spark)
        if per_session is None:
            per_session = {}
            cls._cache[spark] = per_session
        eng = per_session.get(sf_dir)
        if eng is None:
            eng = cls(spark, sf_dir)
            per_session[sf_dir] = eng
        elif cls._registered_dir.get(spark) != sf_dir:
            for name, df in eng.tables.items():
                df.createOrReplaceTempView(name)
            assert eng.triples is not None
            eng.triples.createOrReplaceTempView("triples")
            cls._registered_dir[spark] = sf_dir
        return eng

    # -- relational surface ------------------------------------------------

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def register_function(self, name: str, fn, return_type=None):
        """UDF registration surface (SURVEY §2.9 gap list).  Prefer
        built-in functions — a registered Python UDF is the slow path;
        use pandas_udf for anything hot."""
        return self.spark.udf.register(name, fn, return_type)

    def profile(
        self,
        df_or_table,
        quantile_cols=(),
        item_cols=(),
        distinct_cols=(),
        key_cols=None,
        **kw,
    ) -> dict:
        """Corpus health report in ONE scan (the round-14 profiler tier
        as an engine convenience): GK quantile summaries per numeric
        column, Misra-Gries heavy hitters per item column, HLL distinct
        registers per id-like column, and exact count/null/min/max
        stats — all from a single mapInPandas pass
        (ops/profile.corpus_profile; ``key_cols`` routes to the per-key
        sibling: "profile per language / domain / day").  Accepts a
        DataFrame or a registered table name.  Returns the
        corpus_profile dict: ``quantiles`` (feed gk_quantiles /
        gk_quantiles_by_key), ``heavy_hitters`` (feed mg_topk /
        mg_topk_by_key), ``distinct`` (feed hll_estimate /
        hll_estimate_df), ``stats``, and the checkpointed tall
        ``profile`` frame — persist it with sketch_save(family=
        'profile') and merge tomorrow's run via profile_union
        (key_cols= for per-key) instead of rescanning history.
        Extra keyword args (k/m/p/weight_col/...) pass through."""
        from knovexlite_spark.ops.profile import (
            corpus_profile,
            corpus_profile_by_key,
        )

        df = (
            self.table(df_or_table)
            if isinstance(df_or_table, str)
            else df_or_table
        )
        if key_cols is not None:
            return corpus_profile_by_key(
                df,
                key_cols,
                quantile_cols=quantile_cols,
                item_cols=item_cols,
                distinct_cols=distinct_cols,
                **kw,
            )
        return corpus_profile(
            df,
            quantile_cols=quantile_cols,
            item_cols=item_cols,
            distinct_cols=distinct_cols,
            **kw,
        )

    # -- KG / EFO surface --------------------------------------------------

    def triples_with_inverses(self) -> DataFrame:
        """The XOR-augmented edge view (G4) the reference evaluates over."""
        assert self.triples is not None
        return add_inverse_edges(self.triples)

    def efo(
        self,
        lstr: str,
        bindings: dict[str, int],
        free_var: str = "f",
        augmented: bool = False,
    ) -> DataFrame:
        """Answer an EFO query under exact set semantics: parse ->
        NNF/DNF -> per-conjunct join plan -> UNION (SURVEY §2.2-2.4).
        Returns a one-column DataFrame of entity ids for the free var.

        ``augmented=True`` evaluates over the pair-encoded inverse view
        (relation k -> 2k forward / 2k+1 backward), which inverse-edge
        queries require."""
        from knovexlite_spark.kg.triples import pair_encode_inverse
        from knovexlite_spark.plans.exact import answer_exact

        assert self.triples is not None
        triples = pair_encode_inverse(self.triples) if augmented else self.triples
        return answer_exact(triples, lstr, bindings, free_var=free_var)
