"""Parquet table catalog for the test datasets.

The driver materializes a TPC-H-ish star schema plus ``events`` (stream
surface), ``documents`` and ``embeddings`` (LLM-data-pipeline surface) as
one parquet file per table under ``/root/testdata/sf*/``.

Scale notes: reads are plain ``spark.read.parquet`` so Catalyst performs
column pruning + predicate pushdown into the scan; at 100 TB the same
code reads a partitioned directory tree and partition pruning applies
unchanged. No ``inferSchema``-style work happens here — parquet carries
its own schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_engine_conf(spark: SparkSession) -> None:
    """Apply the runtime-settable engine configs this library relies on.

    Callers may supply their own SparkSession (the driver harness does),
    built without ``get_spark()``'s defaults. Everything here is a
    dynamic SQL conf, so setting it on a live session is safe, and each
    one is required for correctness or sanity of the workload:

    * ``nanosAsLong`` — an events.parquet written as TIMESTAMP(NANOS)
      (earlier testdata generations) is otherwise rejected outright by
      the vectorized reader;
    * ``inferTimestampNTZ`` off — the current events.parquet writes
      ``ts`` as TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark 4
      would surface as TIMESTAMP_NTZ; reading it as plain TIMESTAMP
      (with the UTC session timezone the two are the same instant)
      keeps every downstream ``unix_micros``/window operator working
      AND keeps ts-range predicates pushable at the parquet scan — a
      driver-supplied session without this conf was the round-3 events
      crash;
    * UTC session timezone — hour/date bucketing must agree with the
      DuckDB oracle (which is TZ-naive over the same files);
    * AQE + coalescing/skew handling — the plans are written assuming
      runtime partition coalescing (tiny-SF tests) and skew splitting
      (100 TB), matching get_spark();
    * Arrow — the pandas_udf operators (similarity, multimodal) fall
      back to pickle-per-row without it;
    * shuffle partitions — only when still at Spark's untouched 200
      default, drop to the local core count; a value the caller set
      deliberately is left alone.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # broadcast policy (see session.py): conservative static threshold
    # (scan-size estimates lie for column-pruned fact tables), generous
    # ADAPTIVE threshold (decides on actual post-shuffle bytes). Only
    # applied while the conf is still at Spark's default — a value the
    # caller set deliberately (e.g. -1 to disable broadcasts when
    # debugging) is left alone, same contract as shuffle.partitions.
    from project_graphdb_spark.session import (
        ADAPTIVE_BROADCAST_THRESHOLD,
        STATIC_BROADCAST_THRESHOLD,
    )

    if spark.conf.get("spark.sql.autoBroadcastJoinThreshold") in (
        "10485760b",  # Spark's untouched 10 MB default
        "10MB",
    ):
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold",
            str(STATIC_BROADCAST_THRESHOLD),
        )
    if spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ) in (None, "-1", "-1b"):  # unset default: fall back to static
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            str(ADAPTIVE_BROADCAST_THRESHOLD),
        )
    if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            os.environ.get("SPARK_GRAFT_CPUS", "32"),
        )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. ``name`` must be in ``TABLE_NAMES``.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet file, which Spark's
    vectorized reader rejects; with ``spark.sql.legacy.parquet.nanosAsLong``
    it surfaces as a nanosecond bigint, which we convert to a proper
    microsecond timestamp (truncation — same as DuckDB's nanos→micros
    read) so downstream operators see TimestampType.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Required here (not just in get_spark()) because callers may supply
    # their own SparkSession without the configs this library needs.
    ensure_engine_conf(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":  # TIMESTAMP(NANOS) via nanosAsLong
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type == "timestamp_ntz":  # caller pre-set NTZ inference
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    """Load several tables as a dict of DataFrames (lazy — no I/O yet)."""
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
