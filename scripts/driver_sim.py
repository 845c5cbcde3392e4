"""Simulate the driver's verify pass against __spark_entry__.py:

1. smoke: entry(spark) -> rows >= 0, stable schema
2. for each queries()[name] at sf0.01: run Spark DF and the matching
   oracle_sql()[name] in DuckDB; compare row count + columns + sorted
   values (the driver's order-insensitive value-hash, done literally).

Usage: python scripts/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import __spark_entry__ as entrymod  # noqa: E402
from knovexlite_spark.session import get_spark  # noqa: E402
from oracle_util import check_query  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="driver_sim", master="local[8]", shuffle_partitions=8)

    t0 = time.time()
    df = entrymod.entry(spark)
    rows = df.count()
    print(f"entry: rows={rows} schema={df.schema.simpleString()} ({time.time()-t0:.1f}s)")
    assert rows >= 0

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} oracles, sf_dir={sf_dir}")
    failed = []
    for name in sorted(qs):
        t0 = time.time()
        try:
            check_query(spark, sf_dir, name, qs[name], oracles.get(name))
            mode = "oracle" if name in oracles else "rows-only"
            print(f"  OK   {name} [{mode}] ({time.time()-t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"  FAIL {name}: {exc}")
    print(f"{len(qs) - len(failed)}/{len(qs)} matched")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
