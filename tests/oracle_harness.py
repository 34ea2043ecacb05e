"""Shared oracle-comparison harness: runs a registered query on Spark and
its DuckDB oracle on the same parquet, compares row count, column set and
order-insensitive values (mimics the driver's CORRECTNESS check)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype(np.int64)
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> tuple[bool, str]:
    if len(spark_df) != len(duck_df):
        return False, f"row count {len(spark_df)} != {len(duck_df)}"
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = np.array_equal(av, bv, equal_nan=True)
        else:
            ok = (av == bv).all()
        if not ok:
            idx = int(np.argmax(~(av == bv)) if av.dtype.kind != "f" else
                      np.argmax(~np.isclose(av, bv, rtol=0, atol=0, equal_nan=True)))
            return False, f"column {c} differs at row {idx}: {av[idx]!r} vs {bv[idx]!r}"
    return True, "ok"


def run_one(spark, con, name: str, sf_dir: str):
    import __spark_entry__ as e

    fn = e.queries()[name]
    sql = e.oracle_sql().get(name)
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        return (len(sdf) >= 0), f"rows-only: {len(sdf)} rows", sdf, None
    ddf = con.sql(sql).df()
    ok, msg = compare(sdf, ddf)
    return ok, msg, sdf, ddf
