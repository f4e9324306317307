"""Typed CSV table scan (A5).

The reference's interchange layer is one header CSV per table, re-read
with pandas' C engine (reference: final/inject_node.py:376,
final/inject_relationship.py:660). Ours reads every column as string
with an explicit schema (never ``inferSchema`` — that is a second full
pass over the data) and then applies the same declared-type
normalization pass the SQLite path uses, so CSV-staged and
SQLite-scanned tables are bit-identical downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from project_graphdb_spark.io.normalize import normalize_table
from project_graphdb_spark.schema.relational import TableInfo


def read_csv_table(
    spark: SparkSession,
    path: str,
    table: TableInfo,
    normalize: bool = True,
) -> DataFrame:
    """Header-CSV scan typed by the declared schema.

    All columns load as strings; ``normalize=True`` (default) then
    applies affinity casts (coerce-to-null) and timestamp explosion —
    the B8/B9 rules — exactly as for a SQLite scan.
    """
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c, _ in table.columns]
    )
    df = spark.read.option("header", True).schema(schema).csv(path)
    if normalize:
        df = normalize_table(df, dict(table.columns))
    return df
