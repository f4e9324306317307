"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data-pipeline surface (SURVEY.md §2.E): image/audio/video are
treated as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched pandas functions over ``mapInPandas``. Header-level image
decode (PNG/GIF/BMP/JPEG format + true width/height) is REAL — pure
stdlib ``struct`` parsing, oracle-tested round-trip against stdlib
encoders. Only pixel-level decode/resize (which genuinely needs codec
libraries absent from this container) remains stubbed behind
``NotImplementedError``; the Spark-side plumbing (schema, batch
iteration, partitioning, UDF signatures) is real and oracle-tested.

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

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image(payload: bytes) -> dict:
    """Pure-Python image *header* decode: real width/height/format for
    PNG / GIF / BMP / JPEG payloads via stdlib ``struct`` — no PIL or
    opencv needed. Pixel decode (which genuinely needs codec libraries
    absent from this container) stays out of scope; header parsing is
    the part a metadata-extraction pipeline runs over 100 TB anyway,
    since it touches O(100) bytes per payload regardless of image size.

    Returns ``{"format": str, "width": int, "height": int}``;
    raises ``ValueError`` for payloads that are not a recognized image.
    """
    import struct

    if len(payload) >= 24 and payload[:8] == _PNG_SIG:
        # 8-byte signature, 4-byte chunk length, b"IHDR", then
        # big-endian u32 width, u32 height (PNG spec §11.2.2)
        if payload[12:16] != b"IHDR":
            raise ValueError("PNG missing IHDR as first chunk")
        w, h = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": w, "height": h}
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        # logical screen descriptor: little-endian u16 width, u16 height
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": w, "height": h}
    if len(payload) >= 26 and payload[:2] == b"BM":
        # BITMAPINFOHEADER: signed LE i32 width/height at offsets 18/22
        # (negative height = top-down rows; dimension is abs)
        w, h = struct.unpack("<ii", payload[18:26])
        return {"format": "bmp", "width": w, "height": abs(h)}
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        # JPEG: scan marker segments for the first SOF0-SOF15 frame
        # header (height u16, width u16, big-endian, after precision).
        # Spec quirks handled (ITU-T T.81 §B.1.1.2): any number of 0xFF
        # fill bytes may precede a marker, and TEM (0x01) / RSTn
        # (0xD0-0xD7) / SOI / EOI are standalone markers with no length
        # field.
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                break
            j = i + 1
            while j < len(payload) and payload[j] == 0xFF:
                j += 1  # skip fill bytes; j lands on the marker code
            if j >= len(payload):
                break
            marker = payload[j]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if j + 8 > len(payload):
                    break
                h, w = struct.unpack(">HH", payload[j + 4: j + 8])
                return {"format": "jpeg", "width": w, "height": h}
            if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                i = j + 1  # standalone marker: no length field follows
                continue
            if j + 3 > len(payload):
                break
            seg_len = struct.unpack(">H", payload[j + 1: j + 3])[0]
            i = j + 1 + seg_len
        raise ValueError("JPEG payload has no SOF frame header")
    raise ValueError("unrecognized image payload")


def encode_png(width: int, height: int) -> bytes:
    """Minimal *valid* grayscale PNG of the given dimensions, stdlib
    only: signature + IHDR + one zlib-compressed all-zero IDAT + IEND,
    CRCs included. Used to synthesize deterministic image payloads for
    the multimodal pipeline tests/queries (TESTDATA.md has no binary
    media); any standards-compliant reader decodes the output."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + b"\x00" * width) * height  # filter byte + pixels
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def encode_gif(width: int, height: int) -> bytes:
    """Minimal GIF89a header + logical screen descriptor + trailer."""
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00;"


def encode_bmp(width: int, height: int) -> bytes:
    """Minimal BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (no pixels —
    header-only payload, enough for any metadata scanner)."""
    import struct

    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    file_hdr = struct.pack("<2sIHHI", b"BM", 14 + len(info), 0, 0, 14 + len(info))
    return file_hdr + info


def encode_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG: SOI + APP0/JFIF + SOF0 (one grayscale component)
    + EOI, same header-only style as :func:`encode_bmp`. A spec-legal
    0xFF fill byte pads the SOF0 marker (ITU-T T.81 §B.1.1.2), so the
    registered query exercises the decoder's fill-byte skip, not just
    the happy path."""
    import struct

    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x02\x00"
        + struct.pack(">HH", 1, 1)
        + b"\x00\x00"
    )
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)  # 8 + 3 * components
        + b"\x08"  # precision
        + struct.pack(">HH", height, width)
        + b"\x01" + b"\x01\x11\x00"  # 1 component: id, sampling, qtable
    )
    return b"\xff\xd8" + app0 + b"\xff" + sof0 + b"\xff\xd9"


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


DIMS_SCHEMA = "doc_id bigint, format string, width bigint, height bigint"

_ENCODERS = {
    "png": encode_png,
    "gif": encode_gif,
    "bmp": encode_bmp,
    "jpeg": encode_jpeg,
}
_FORMAT_CYCLE = ("png", "gif", "bmp", "jpeg")


def synthesize_image_payloads(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: doc_id → deterministic image payload.

    Stands in for a parquet scan of a real media table (TESTDATA.md has
    none): format cycles png/gif/bmp/jpeg by ``doc_id % 4`` and
    dimensions derive from ``doc_id``, so an oracle can recompute the
    expectation from the id alone. Payloads are built executor-side
    inside the Arrow batch — the driver never sees a byte of media.
    """
    for pdf in batches:
        ids = pdf["doc_id"]
        payloads = [
            _ENCODERS[_FORMAT_CYCLE[i % 4]](i % 640 + 1, (i * 7) % 480 + 1)
            for i in ids
        ]
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def extract_image_dims(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: binary payload → (format, width, height)
    via the real stdlib header decoder — no stub constants."""
    for pdf in batches:
        decoded = [decode_image(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "format": [d["format"] for d in decoded],
                "width": [d["width"] for d in decoded],
                "height": [d["height"] for d in decoded],
            }
        )


@register(
    "multimodal_image_dims",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png'
                WHEN 1 THEN 'gif' WHEN 2 THEN 'bmp'
                ELSE 'jpeg' END AS format,
           doc_id % 640 + 1 AS width,
           (doc_id * 7) % 480 + 1 AS height
    FROM documents ORDER BY doc_id
    """,
    description="multimodal image decode: synthetic PNG/GIF/BMP/JPEG "
    "payloads built executor-side (the JPEG carries a spec-legal fill "
    "byte before SOF0), then REAL stdlib header parsing (struct-level "
    "width/height/format, no stub constants) via chained mapInPandas",
)
def multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    payloads = ids.mapInPandas(
        synthesize_image_payloads, schema="doc_id bigint, payload binary"
    )
    return payloads.mapInPandas(
        extract_image_dims, schema=DIMS_SCHEMA
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
