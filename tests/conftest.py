from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_graphdb_spark import get_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests")
    yield spark
    # r12: bucketed Pregel adjacency tables are session-cache-owned;
    # without this release a pytest session orphans its tables' parquet
    # in spark-warehouse/ when the in-memory metastore dies with the JVM
    from project_graphdb_spark.graph.algorithms import (
        release_edge_layouts,
    )

    release_edge_layouts(spark)
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF001


@pytest.fixture(scope="session")
def oracle_sf_dir() -> str:
    """Scale factor used for oracle-parity tests (matches the driver's t2)."""
    return SF01
