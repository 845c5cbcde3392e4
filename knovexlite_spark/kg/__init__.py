from knovexlite_spark.kg.triples import (
    read_triples_tsv,
    validate_triples,
    add_inverse_edges,
    inverse_relation_id,
    build_triples_view,
)
from knovexlite_spark.kg.catalog import KGCatalog

__all__ = [
    "read_triples_tsv",
    "validate_triples",
    "add_inverse_edges",
    "inverse_relation_id",
    "build_triples_view",
    "KGCatalog",
]
