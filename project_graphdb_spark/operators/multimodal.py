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


FRAME_BYTES = 64  # deterministic fake "frame" size for the stub codec
FRAME_SCHEMA = (
    "doc_id bigint, frame_index bigint, frame_bytes bigint, "
    "frame_digest string"
)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """Stub: real resize needs PIL/opencv (absent here). The Spark-side
    call shape (mapInPandas over binary + params) is what's tested."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not present in this environment"
    )


def sample_frames(every_n: int = 2):
    """mapInPandas operator factory: binary payload → sampled "frames".

    The stub codec treats the payload as consecutive ``FRAME_BYTES``
    chunks (a real video decoder yields frames the same way — an
    iterator per payload); every ``every_n``-th frame is kept and
    digested. One input row fans out to many output rows *within* the
    Arrow batch — the explode happens executor-side, nothing ever
    returns to the driver.
    """
    import hashlib

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "frame_index": [],
                "frame_bytes": [], "frame_digest": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    chunk = payload[i * FRAME_BYTES: (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_bytes"].append(len(chunk))
                    out["frame_digest"].append(
                        hashlib.md5(chunk).hexdigest()
                    )
            yield pd.DataFrame(out)

    return op


@register(
    "multimodal_frame_sample",
    oracle="""
    -- documents are ASCII (asserted by equal char/byte lengths), so
    -- VARCHAR substr chunks equal the byte frames Spark digests
    WITH nums AS (SELECT i FROM generate_series(0, 4095) t(i)),
    frames AS (
      SELECT d.doc_id, i AS frame_index,
             substr(d.text, CAST(i * 64 + 1 AS BIGINT), 64) AS chunk
      FROM documents d
      JOIN nums ON i < ceil(octet_length(encode(d.text)) / 64.0)
      WHERE i % 2 = 0 AND d.doc_id < 200
    )
    SELECT doc_id, frame_index,
           octet_length(encode(chunk)) AS frame_bytes,
           md5(chunk) AS frame_digest
    FROM frames ORDER BY doc_id, frame_index
    """,
    description="multimodal frame sampling: payload → every-2nd 64-byte "
    "frame + digest via mapInPandas fan-out (stub codec, real plumbing)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    ).select("doc_id", "text")
    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(
        sample_frames(every_n=2), schema=FRAME_SCHEMA
    ).orderBy("doc_id", "frame_index")
