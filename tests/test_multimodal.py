"""Multimodal surface: real stdlib image-header decode (PNG/GIF/BMP/
JPEG) round-tripped against the stdlib encoders, plus the registered
mapInPandas query asserting TRUE dimensions (not stub constants)."""

from __future__ import annotations

import struct
import zlib

import pytest

from project_graphdb_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_gif,
    encode_png,
    multimodal_image_dims,
)


@pytest.mark.parametrize(
    "enc,fmt",
    [(encode_png, "png"), (encode_gif, "gif"), (encode_bmp, "bmp")],
)
@pytest.mark.parametrize("w,h", [(1, 1), (640, 480), (31, 257)])
def test_decode_roundtrip(enc, fmt, w, h):
    got = decode_image(enc(w, h))
    assert got == {"format": fmt, "width": w, "height": h}


def test_png_payload_is_standards_valid():
    """The synthetic PNG is a real PNG, not just a parseable prefix:
    IDAT zlib-inflates to exactly height scanlines of 1 filter byte +
    width pixel bytes, and every chunk CRC checks out."""
    payload = encode_png(5, 3)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    i, chunks = 8, {}
    while i < len(payload):
        (length,) = struct.unpack(">I", payload[i : i + 4])
        tag = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[i + 8 + length : i + 12 + length]
        )
        assert crc == zlib.crc32(tag + body), tag
        chunks[tag] = body
        i += 12 + length
    assert set(chunks) == {b"IHDR", b"IDAT", b"IEND"}
    assert len(zlib.decompress(chunks[b"IDAT"])) == 3 * (1 + 5)


def test_decode_jpeg_sof_scan():
    """Hand-built minimal JPEG: SOI, an APP0 segment to skip, then a
    SOF0 frame header carrying height=480 width=640."""
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 480, 640)
        + b"\x01\x11\x00\x00"
    )
    got = decode_image(b"\xff\xd8" + app0 + sof0 + b"\xff\xd9")
    assert got == {"format": "jpeg", "width": 640, "height": 480}


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"not an image at all",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 8 + b"NOPE" + b"\x00" * 8,
        b"\xff\xd8\xff\xd9",  # JPEG with no SOF
        b"GIF8",  # truncated GIF magic
    ],
)
def test_decode_rejects_non_images(bad):
    with pytest.raises(ValueError):
        decode_image(bad)


def test_image_dims_query_true_dimensions(spark, sf_dir):
    """The registered query emits the decoder's measured dimensions,
    which must equal the id-derived ground truth for every row."""
    rows = multimodal_image_dims(spark, sf_dir).collect()
    assert rows
    cycle = ("png", "gif", "bmp", "jpeg")
    for r in rows:
        i = r["doc_id"]
        assert r["format"] == cycle[i % 4]
        assert r["width"] == i % 640 + 1
        assert r["height"] == (i * 7) % 480 + 1


def test_decode_jpeg_fill_bytes_and_standalone_markers():
    """ITU-T T.81 §B.1.1.2 quirks: 0xFF fill bytes may pad before any
    marker, and TEM (0x01) / RSTn (0xD0-0xD7) are standalone markers
    with no length field — the SOF scan must step over both instead of
    misreading a length from the wrong offset."""
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", 33, 77)
        + b"\x01\x11\x00\x00"
    )
    # fill bytes before APP0 and before SOF0, a TEM and an RST in between
    payload = (
        b"\xff\xd8"
        + b"\xff" * 3 + app0[1:]   # FF FF FF E0 ... (fill + marker)
        + b"\xff\x01"              # TEM: standalone
        + b"\xff\xd3"              # RST3: standalone
        + b"\xff" + sof0[1:]       # one fill byte, then C0
        + b"\xff\xd9"
    )
    got = decode_image(payload)
    assert got == {"format": "jpeg", "width": 77, "height": 33}
