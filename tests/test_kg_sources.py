"""KG source/sink operators S1/S2/S4/S5 + inverse augmentation G4."""

from knovexlite_spark.kg.catalog import KGCatalog
from knovexlite_spark.kg.triples import (
    add_inverse_edges,
    inverse_relation_id,
    pair_encode_inverse,
    read_triples_tsv,
    validate_triples,
)
from pyspark.sql import functions as F

TRIPLES = [(0, 0, 1), (1, 2, 2), (2, 4, 0)]


def test_tsv_scan_roundtrip(spark, tmp_path):
    p = tmp_path / "triples.tsv"
    p.write_text("".join(f"{h}\t{r}\t{t}\n" for h, r, t in TRIPLES))
    df = read_triples_tsv(spark, str(p))
    assert sorted((r["h"], r["r"], r["t"]) for r in df.collect()) == sorted(TRIPLES)


def test_validated_ingest(spark):
    triples = spark.createDataFrame(TRIPLES + [(9, 0, 1), (0, 99, 1)], "h long, r long, t long")
    ents = spark.createDataFrame([(i, f"e{i}") for i in range(3)], "id long, name string")
    rels = spark.createDataFrame([(i, f"r{i}") for i in range(6)], "id long, name string")
    valid, n_bad = validate_triples(triples, ents, rels)
    assert n_bad == 2
    assert sorted((r["h"], r["r"], r["t"]) for r in valid.collect()) == sorted(TRIPLES)


def test_inverse_edges(spark):
    df = spark.createDataFrame(TRIPLES, "h long, r long, t long")
    aug = add_inverse_edges(df)
    assert aug.count() == 2 * len(TRIPLES)
    rows = {(r["h"], r["r"], r["t"]) for r in aug.collect()}
    assert (1, 1, 0) in rows  # inverse of (0, 0, 1) under XOR
    pe = {(r["h"], r["r"], r["t"]) for r in pair_encode_inverse(df).collect()}
    assert (0, 0, 1) in pe and (1, 1, 0) in pe  # rel 0 -> 0/1
    assert (1, 4, 2) in pe and (2, 5, 1) in pe  # rel 2 -> 4/5
    inv = spark.range(1).select(inverse_relation_id(F.lit(4)).alias("i")).collect()[0]["i"]
    assert inv == 5


def test_catalog_roundtrip(spark, tmp_path):
    cat = KGCatalog.from_names(spark, ["alice", "bob"], ["knows", "knows_inv"])
    path = str(tmp_path / "cat.json")
    cat.dump_json(path)
    back = KGCatalog.load_json(spark, path)
    assert {(r["id"], r["name"]) for r in back.entities.collect()} == {(0, "alice"), (1, "bob")}
    out_dir = str(tmp_path / "id2name")
    back.dump_id2name_tsv(out_dir, collapse_inverse=True)
    rels = spark.read.option("sep", "\t").csv(out_dir + "/relations").collect()
    assert len(rels) == 1 and rels[0][1] == "knows"  # collapsed pair


def test_name_resolution_broadcast_join(spark):
    cat = KGCatalog.from_names(spark, ["alice", "bob", "carol"], ["knows"])
    df = spark.createDataFrame([(0,), (2,)], "ent long")
    out = cat.resolve_entity_names(df, "ent", "ent_name").collect()
    assert {(r["ent"], r["ent_name"]) for r in out} == {(0, "alice"), (2, "carol")}
