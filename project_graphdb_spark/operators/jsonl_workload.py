"""Registered JSONL ingest query: parquet → JSONL shards → schema-first
scan → aggregate, proving the round trip preserves every row and type.

The oracle computes the same aggregate from the base ``documents``
table, so any row lost/duplicated/retyped by the JSONL hop breaks the
hash gate (same pattern as ``graph_sink_roundtrip``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from project_graphdb_spark.io.jsonl import read_jsonl, write_jsonl
from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.workload import register

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


@register(
    "jsonl_roundtrip_lang_stats",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM documents GROUP BY lang ORDER BY lang
    """,
    description="JSONL ingest round trip: write documents as JSONL "
    "shards, re-scan with an explicit schema (no inference pass), "
    "aggregate per language; oracle = same aggregate from the base "
    "table, so the hop must preserve every row and type",
)
def jsonl_roundtrip_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="jsonl_roundtrip_")
    try:
        write_jsonl(docs, path)
        back = read_jsonl(spark, path, DOC_SCHEMA)
        out = (
            back.groupBy("lang")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
                F.min("doc_id").cast("bigint").alias("first_doc"),
            )
            .orderBy("lang")
        )
        from project_graphdb_spark.spark_util import lingering_checkpoint

        return lingering_checkpoint(out)
    finally:
        shutil.rmtree(path, ignore_errors=True)
