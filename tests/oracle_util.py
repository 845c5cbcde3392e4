"""Local mirror of the driver's DuckDB-oracle compare: row count, schema
(column names), and order-insensitive values."""

from __future__ import annotations

import duckdb
import pandas as pd

from knovexlite_spark.schemas import TESTDATA_TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out[sorted(out.columns)]
    for c in out.columns:
        col = out[c]
        if str(col.dtype).startswith("datetime64"):
            try:
                col = col.dt.tz_localize(None)
            except TypeError:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            out[c] = col.astype("datetime64[us]")
        elif col.dtype == object:
            out[c] = col.map(lambda v: None if v is None else str(v))
    out = out.sort_values(by=list(out.columns), ignore_index=True, na_position="first")
    return out


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    if not a.equals(b):
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        sample = []
        for c in diff_cols[:3]:
            mism = a.index[a[c].astype(str) != b[c].astype(str)][:3]
            for i in mism:
                sample.append(f"{c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
        raise AssertionError(f"{name}: value mismatch in {diff_cols}; {sample}")


def check_query(spark, sf_dir: str, name: str, spark_fn, sql: str | None) -> None:
    sdf = spark_fn(spark, sf_dir).toPandas()
    if sql is None:
        assert len(sdf) >= 0
        return
    con = duckdb_conn(sf_dir)
    try:
        odf = con.execute(sql).df()
    finally:
        con.close()
    compare_frames(sdf, odf, name)
