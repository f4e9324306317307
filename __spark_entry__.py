"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`project_graphdb_spark.workload`, the single registry
where every implemented operator from SURVEY.md §2 is declared as a
(Spark DataFrame builder, DuckDB oracle SQL) pair.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from project_graphdb_spark import workload  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue per year) on /root/testdata/sf0.001."""
    from project_graphdb_spark.operators.relational import (
        flagship_revenue_per_year,
    )

    return flagship_revenue_per_year(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return workload.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return workload.oracle_sql()
