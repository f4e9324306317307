"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side by side, then
compares row count, column names, and order-insensitive values. The
comparison is deliberately TYPE-STRICT: the driver's value hash is
type/format-sensitive (r7 verdict — a DuckDB HUGEINT `1` vs a Spark
BIGINT `1` hash-mismatches even though the values are equal), so an
integer-typed cell on one side and a float-typed cell on the other is
a failure here too, not a coerced pass. Floats are compared exactly —
our aggregates are engineered (exact decimal arithmetic) to be
bit-identical across engines; any drift is a bug we want to see in
tests, not at driver time.

``lint_oracle_types`` additionally binds (without executing) every
oracle and rejects output columns whose DuckDB type has no faithful
pandas/Spark twin (HUGEINT / UHUGEINT / INT128) — the class of bug
that produced r7's only red driver row.
"""

from __future__ import annotations

import datetime
import decimal
import math

import duckdb
import numpy as np
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

# DuckDB output types with no faithful pandas/Arrow/Spark twin: the
# driver's hash tags them differently from BIGINT even when values match.
BANNED_ORACLE_TYPES = {"HUGEINT", "UHUGEINT", "INT128", "UINT128"}


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def lint_oracle_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[str]:
    """Bind (no execution) an oracle and return the driver-hash-hostile
    output columns, e.g. ``["session_id:HUGEINT"]``. Empty == clean."""
    rel = con.sql(sql)
    return [
        f"{c}:{t}"
        for c, t in zip(rel.columns, rel.types)
        if str(t).upper() in BANNED_ORACLE_TYPES
    ]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


_INT_TYPES = (int, np.integer)
_FLOAT_TYPES = (float, np.floating)


def _kind(v) -> str:
    """Canonical type kind, mirroring what a type-tagged value hash sees.

    bool before int (numpy bools are not ints, Python bools are);
    Decimal is its own kind — Spark DECIMAL and DuckDB DECIMAL both
    surface as ``decimal.Decimal`` in pandas, while a float on either
    side is a real skew the driver would hash differently.
    """
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, _INT_TYPES):
        return "int"
    if isinstance(v, _FLOAT_TYPES):
        return "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return "timestamp"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "array"
    return type(v).__name__


def _cell_eq(a, b) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a))
    b_null = b is None or (isinstance(b, float) and math.isnan(b))
    if not a_null and not b_null and not isinstance(a, (list, np.ndarray)):
        try:
            a_null = bool(pd.isna(a))
            b_null = bool(pd.isna(b))
        except (TypeError, ValueError):
            pass
    if a_null or b_null:
        return bool(a_null and b_null)
    ka, kb = _kind(a), _kind(b)
    if ka != kb:
        return False
    if ka == "array":
        va, vb = list(a), list(b)
        return len(va) == len(vb) and all(
            _cell_eq(x, y) for x, y in zip(va, vb)
        )
    if ka == "float":
        return float(a) == float(b)
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    bad_types = lint_oracle_types(con, sql)
    if bad_types:
        problems.append(
            "oracle output type has no Spark twin (driver hash-hostile): "
            + ", ".join(bad_types)
            + " — CAST it (usually AS BIGINT)"
        )
        return problems
    got = spark_df.toPandas()
    want = con.sql(sql).df()
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
                    f"value mismatch col={col} row={i}: "
                    f"spark={a!r}({_kind(a)}) oracle={b!r}({_kind(b)})"
                )
                if len(problems) > 5:
                    return problems
    return problems
