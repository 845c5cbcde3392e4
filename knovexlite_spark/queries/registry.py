"""Central registry aggregating every module's declared queries/oracles.

Each query module exposes ``queries() -> {name: fn(spark, sf_dir) -> DF}``
and ``oracle_sql() -> {name: sql}`` (oracle entries may be omitted for
non-SQL-expressible ops — the driver then records a rows-only check).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Modules are imported lazily/defensively so one broken module never takes
# down the whole surface.
QUERY_MODULES = [
    "knovexlite_spark.queries.relational",
    "knovexlite_spark.queries.efo",
    "knovexlite_spark.queries.pipeline",
    "knovexlite_spark.queries.reasoning",
    "knovexlite_spark.queries.streaming_gate",
    "knovexlite_spark.queries.extras",
]


def _modules():
    mods = []
    for m in QUERY_MODULES:
        try:
            mods.append(importlib.import_module(m))
        except ImportError:
            continue
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.queries())
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.oracle_sql())
    return out
