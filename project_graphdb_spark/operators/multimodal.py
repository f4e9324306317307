"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline surface (SURVEY.md §2.E): image/audio/video are
treated as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``. The container has
no image/audio libraries, so the *decode* step is stubbed — but the
Spark-side plumbing (schema, batch iteration, partitioning, UDF
signatures) is real and oracle-tested by driving UTF-8 text payloads
through the same path.

Design for 100 TB of binary payloads:

* payloads stay in executor-side Arrow batches end to end — nothing is
  collected to the driver;
* ``mapInPandas`` processes an iterator of batches, so one task never
  materializes its whole partition;
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
  (set in the session factory) — the knob that matters when single
  payloads are MBs;
* metadata extraction emits narrow typed columns, so downstream
  filtering/joins never touch the binary column again (column pruning
  drops it at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_graphdb_spark.io.tables import load_table
from project_graphdb_spark.workload import register

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, first_byte bigint, last_byte bigint"
)


def decode_image(payload: bytes) -> dict:
    """Stub: real image decode (PIL/libjpeg) is unavailable in this
    container. The Spark-side contract is the point; swap this body for
    a real decoder on a cluster with the codec libraries installed."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; not present in this environment"
    )


def extract_payload_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: binary payload -> typed feature columns.

    Deterministic byte-level features stand in for the stubbed decode;
    the iteration/batching shape is exactly what a real decoder uses.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else None
                ).astype("Int64"),
                "last_byte": payloads.map(
                    lambda b: b[-1] if len(b) else None
                ).astype("Int64"),
            }
        )


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload binary, media_type) — the canonical
    multimodal layout (binary column + typed metadata)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


@register(
    "multimodal_payload_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           ascii(substr(text, length(text), 1)) AS last_byte
    FROM documents ORDER BY doc_id
    """,
    description="multimodal plumbing: binary payload → mapInPandas "
    "(Arrow-batched) feature extraction; decode stubbed, pipeline real",
)
def multimodal_payload_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(
        extract_payload_features, schema=FEATURE_SCHEMA
    ).orderBy("doc_id")
