"""Exact Spark-vs-DuckDB comparison mirroring the driver's gate:
row count + column names + order-insensitive exact value equality
(arrays compared element-exact, order-sensitive within the array)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, np.generic):
        v = v.item()
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    return v


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows, key=repr)


def assert_parity(spark_df, oracle_df: pd.DataFrame, name: str = "query") -> None:
    sdf = spark_df.toPandas() if not isinstance(spark_df, pd.DataFrame) else spark_df
    assert sorted(sdf.columns) == sorted(oracle_df.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(sdf) == len(oracle_df), (
        f"{name}: row count {len(sdf)} vs {len(oracle_df)}"
    )
    a, b = canon_rows(sdf), canon_rows(oracle_df)
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"{name}: first differing row {i}:\n spark={ra}\n duck ={rb}"
