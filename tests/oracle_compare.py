"""Local replica of the driver's Spark-vs-DuckDB correctness comparison.

Runs a queries()-style callable on Spark and its oracle SQL on DuckDB over
the same parquet dir, then compares row count + column names + order-
insensitive values (columns sorted by name, rows sorted, NaN-safe).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: str(v) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, duck_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(duck_df.columns):
        return False, f"schema mismatch: spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}"
    if len(sp) != len(duck_df):
        return False, f"row count mismatch: spark={len(sp)} duck={len(duck_df)}"
    a = _normalize(sp)
    b = _normalize(duck_df)
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        return False, f"value mismatch: {str(e)[:500]}"
    return True, f"OK ({len(sp)} rows)"
