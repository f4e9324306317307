"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and order-insensitive values. Floats
are compared exactly — our aggregates are engineered (exact decimal
arithmetic) to be bit-identical across engines; any drift is a bug we
want to see in tests, not at driver time.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

TABLES = (
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
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def _cell_eq(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or pd.isna(a)
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or pd.isna(b)
    if a_null or b_null:
        return bool(a_null and b_null)
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    got = spark_df.toPandas()
    want = con.sql(sql).df()
    problems: list[str] = []
    if sorted(got.columns) != sorted(want.columns):
        problems.append(
            f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
        )
        return problems
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return problems
    g, w = _canon(got), _canon(want)
    for col in g.columns:
        for i, (a, b) in enumerate(zip(g[col], w[col])):
            if not _cell_eq(a, b):
                problems.append(
                    f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"
                )
                if len(problems) > 5:
                    return problems
    return problems
