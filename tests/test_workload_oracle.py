"""Every registered query with an oracle must match it at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from project_graphdb_spark import workload
from tests.oracle_util import compare, duckdb_con

workload._ensure_loaded()
NAMES = sorted(workload.oracle_sql())


@pytest.fixture(scope="module")
def con(oracle_sf_dir):
    con = duckdb_con(oracle_sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, oracle_sf_dir, con):
    qd = workload.REGISTRY[name]
    df = qd.fn(spark, oracle_sf_dir)
    problems = compare(df, con, qd.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_all_queries_return_rows(spark, sf_dir):
    """Smoke: every registered query runs at sf0.001 and has a schema."""
    for name, fn in workload.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.count()  # executes without error
