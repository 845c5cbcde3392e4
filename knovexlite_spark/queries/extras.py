"""Rows-only gate entries: operators whose outputs are inherently
non-reproducible in ANSI SQL (approximate sketches, untrained neural
scores).  The driver records a weaker rows-only check for these; their
correctness is pinned by unit tests instead (tolerance vs exact for the
sketches, structural invariants for LMPNN — SURVEY §5.4 'no golden
floats')."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark.engine import Engine


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts per order priority (the approximate
    aggregate surface, SURVEY §2.9)."""
    orders = Engine.for_dir(spark, sf_dir).table("orders")
    return orders.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", 0.01).alias("approx_custs"),
        F.count("*").alias("n"),
    )


def q_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles of order totals."""
    orders = Engine.for_dir(spark, sf_dir).table("orders")
    return orders.select(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], 10000).alias("q")
    ).select(
        F.col("q")[0].alias("p50"), F.col("q")[1].alias("p90"), F.col("q")[2].alias("p99")
    )


def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct counts and GK percentiles in ONE tagged rows-only
    row (the driver records at most 50 queries — round-1 forensics),
    normalized to (kind, key, val)."""
    hll = q_approx_distinct(spark, sf_dir).select(
        F.lit("hll_distinct").alias("kind"),
        F.col("o_orderpriority").alias("key"),
        F.col("approx_custs").cast("double").alias("val"),
    )
    cnt = q_approx_distinct(spark, sf_dir).select(
        F.lit("group_count").alias("kind"),
        F.col("o_orderpriority").alias("key"),
        F.col("n").cast("double").alias("val"),
    )
    gk = (
        q_approx_quantiles(spark, sf_dir)
        .selectExpr("stack(3, 'p50', p50, 'p90', p90, 'p99', p99) AS (key, val)")
        .select(F.lit("gk_quantile").alias("kind"), "key", F.col("val").cast("double"))
    )
    return hll.unionAll(cnt).unionAll(gk)


def q_lmpnn_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LMPNN message passing over the bridge KG (untrained TransE store):
    top-20 entities by cosine readout for a 2p query batch.  Rows-only:
    scores are float model outputs."""
    from knovexlite_spark.functions.kge import EmbeddingStore, TransE
    from knovexlite_spark.functions.oracle import densify_entities
    from knovexlite_spark.kg.triples import pair_encode_inverse
    from knovexlite_spark.queries.efo import PLACED, CONTAINS, _pinned_constants
    from knovexlite_spark.reasoner.lmpnn import LMPNN, build_query_graph_frames

    engine = Engine.for_dir(spark, sf_dir)
    pinned = _pinned_constants(engine)
    mapping, _ = densify_entities(pair_encode_inverse(engine.triples))
    mapping = mapping.cache()
    n = mapping.count()
    s1 = mapping.filter(F.col("orig") == pinned["s1"]).collect()[0]["dense"]

    store = EmbeddingStore.xavier(n, 10, ent_dim=16, seed=42)
    lm = LMPNN(model=TransE(), store=store)
    nodes, edges = build_query_graph_frames(
        spark,
        [
            (0, "r1(s1,f)", {"r1": PLACED, "s1": int(s1)}),
            (1, "r1(s1,e1)&r2(e1,f)", {"r1": PLACED, "r2": CONTAINS, "s1": int(s1)}),
        ],
    )
    scores = lm.eval_all_entity_scores(nodes, edges)
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "t")
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("query_id", "t", F.col("rn").cast("long").alias("rn"))
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing through the gate: documents' text bytes stand
    in for media payloads; the Arrow-batched decode->featurize pipeline
    runs with the deterministic fake decoder (real codecs are stubbed —
    SURVEY brief).  Rows-only: features are decoder-defined."""
    from knovexlite_spark.ops.multimodal import decode_and_featurize

    docs = Engine.for_dir(spark, sf_dir).table("documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("w"), F.lit("8")).alias("meta"),
    )
    feats = decode_and_featurize(media, use_fake_decoder=True)
    return feats.select(
        "media_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.size("feat").cast("long").alias("feat_dim"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "approx_sketches": q_approx_sketches,
        "lmpnn_scores": q_lmpnn_scores,
        "multimodal_features": q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {}  # rows-only by design
