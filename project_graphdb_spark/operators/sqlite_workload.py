"""Oracle-gated proof of the SQLite ingest path (§3.2).

Builds a real SQLite database from the sf_dir's dimension parquet
(region/nation/customer with declared PKs/FKs), runs the complete
introspect → infer → normalize → graph-build pipeline on it, then
answers a 2-hop graph query whose oracle runs directly on the parquet —
so a hash match certifies the entire ingest chain, not just the query.
"""

from __future__ import annotations

import os
import sqlite3
import tempfile

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.sqlite import sqlite_to_graph
from project_graphdb_spark.operators.exact import exact_sum
from project_graphdb_spark.workload import register

_DDL = """
CREATE TABLE region (
    r_regionkey BIGINT PRIMARY KEY,
    r_name TEXT
);
CREATE TABLE nation (
    n_nationkey BIGINT PRIMARY KEY,
    n_name TEXT,
    n_regionkey BIGINT REFERENCES region(r_regionkey)
);
CREATE TABLE customer (
    c_custkey BIGINT PRIMARY KEY,
    c_name TEXT,
    c_nationkey BIGINT REFERENCES nation(n_nationkey),
    c_acctbal DOUBLE,
    c_mktsegment TEXT
);
"""

_DB_CACHE: dict[str, str] = {}


def _sqlite_db_for(sf_dir: str) -> str:
    """Materialize (once per sf_dir) a SQLite DB from the parquet dims."""
    if sf_dir in _DB_CACHE and os.path.exists(_DB_CACHE[sf_dir]):
        return _DB_CACHE[sf_dir]
    path = os.path.join(
        tempfile.mkdtemp(prefix="graphdb_sqlite_"), "dims.db"
    )
    con = sqlite3.connect(path)
    con.executescript(_DDL)
    for name in ("region", "nation", "customer"):
        t = pq.read_table(os.path.join(sf_dir, f"{name}.parquet"))
        cols = [c for c, _ in _table_columns(name)]
        rows = list(zip(*(t.column(c).to_pylist() for c in cols)))
        con.executemany(
            f"INSERT INTO {name} VALUES ({','.join('?' * len(cols))})", rows
        )
    con.commit()
    con.close()
    _DB_CACHE[sf_dir] = path
    return path


def _table_columns(name: str) -> list[tuple[str, str]]:
    from project_graphdb_spark.schema.relational import TPCH_SCHEMA

    return TPCH_SCHEMA.tables[name].columns


@register(
    "sqlite_ingest_customers_per_region",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS total_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY r.r_name ORDER BY r.r_name
    """,
    description="end-to-end SQLite ingest (A1-A3, B1-B8, §3.2): parquet →"
    " sqlite file → introspect → infer → graph build → 2-hop query; "
    "oracle runs on the original parquet",
)
def sqlite_ingest_customers_per_region(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    graph, _, _ = sqlite_to_graph(spark, _sqlite_db_for(sf_dir))
    cust = graph.nodes["Customer"]
    region = graph.nodes["Region"]
    c2n = graph.edges["HAS_NATION"].df  # src=c_custkey, dst=n_nationkey
    n2r = graph.edges["HAS_REGION"].df  # src=n_nationkey, dst=r_regionkey
    return (
        cust.join(c2n, cust.c_custkey == c2n.src)
        .join(F.broadcast(n2r), c2n.dst == n2r.src)
        .join(F.broadcast(region), n2r.dst == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum("c_acctbal", "total_acctbal"),
        )
        .orderBy("r_name")
    )
