"""Name<->id catalog (KGIndex equivalent).

Reference parity: /root/reference/knovex/structure/kg/index.py —
``map_entity_name_to_id`` / ``map_relation_name_to_id`` dicts with JSON
dump/load (index.py:46-69) and an id2name TSV sink that halves relation
ids when collapsing inverse pairs (index.py:79-94).

Spark-first: the catalog is two dimension DataFrames ``entities(id,name)``
and ``relations(id,name)``; name resolution is a broadcast join, never a
driver-side dict at scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knovexlite_spark import schemas


@dataclass
class KGCatalog:
    entities: DataFrame
    relations: DataFrame

    # -- construction ------------------------------------------------------

    @classmethod
    def from_names(
        cls, spark: SparkSession, entity_names: list[str], relation_names: list[str]
    ) -> "KGCatalog":
        ents = spark.createDataFrame(list(enumerate(entity_names)), schema="id LONG, name STRING")
        rels = spark.createDataFrame(list(enumerate(relation_names)), schema="id LONG, name STRING")
        return cls(ents.select("id", "name"), rels.select("id", "name"))

    @classmethod
    def load_json(cls, spark: SparkSession, path: str) -> "KGCatalog":
        """S4 source: the reference's KGIndex.load JSON layout
        (index.py:56-69): {"e": {name: id}, "r": {name: id}}."""
        with open(path) as f:
            obj = json.load(f)
        ents = spark.createDataFrame(
            [(int(i), n) for n, i in obj["e"].items()], schema=schemas.ENTITIES
        )
        rels = spark.createDataFrame(
            [(int(i), n) for n, i in obj["r"].items()], schema=schemas.RELATIONS
        )
        return cls(ents, rels)

    # -- sinks -------------------------------------------------------------

    def dump_json(self, path: str) -> None:
        """S4 sink (index.py:46-54). Catalogs are dims — a driver-side
        collect is the right call here, not a distributed write."""
        obj = {
            "e": {r["name"]: r["id"] for r in self.entities.collect()},
            "r": {r["name"]: r["id"] for r in self.relations.collect()},
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(obj, f)

    def dump_id2name_tsv(self, out_dir: str, collapse_inverse: bool = True) -> None:
        """S5 sink (index.py:79-94): id2name TSVs; relation ids are halved
        when inverse pairs are collapsed (``rid // 2`` over even ids)."""
        self.entities.select("id", "name").write.mode("overwrite").option("sep", "\t").csv(
            os.path.join(out_dir, "entities")
        )
        rels = self.relations
        if collapse_inverse:
            rels = rels.filter(F.col("id") % 2 == 0).select(
                (F.col("id") / 2).cast("long").alias("id"), "name"
            )
        rels.write.mode("overwrite").option("sep", "\t").csv(os.path.join(out_dir, "relations"))

    # -- resolution --------------------------------------------------------

    def resolve_entity_names(self, df: DataFrame, id_col: str, name_col: str) -> DataFrame:
        """Broadcast-join name resolution (the dict lookup, distributed)."""
        dim = F.broadcast(self.entities.withColumnsRenamed({"id": id_col, "name": name_col}))
        return df.join(dim, id_col, "left")
