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
    encode_jpeg,
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


# -- real PNG pixel codec ---------------------------------------------------


def _png_from_raw(w, h, ctype, raw):
    """Hand-build a PNG from an already-filtered raw scanline stream."""
    from project_graphdb_spark.operators.multimodal import _PNG_SIG

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_roundtrip_all_channel_counts():
    import numpy as np

    from project_graphdb_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_pixels,
    )

    rng = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 9, c), dtype=np.uint8)
        out = decode_png_pixels(encode_png_pixels(px))
        assert out.shape == (13, 9, c)
        assert (out == px).all()


def test_png_decode_all_scanline_filters():
    """Exercise Sub/Up/Average/Paeth decode against hand-filtered
    streams (the encoder only emits filter 0, so these come from
    spec-side construction)."""
    import numpy as np

    from project_graphdb_spark.operators.multimodal import decode_png_pixels

    # target image, grayscale 3x4
    img = np.array(
        [[10, 20, 30, 40], [15, 25, 35, 45], [100, 90, 80, 70]],
        dtype=np.uint8,
    )

    def sub_filter(line, prev):
        out = line.astype(int).copy()
        for x in range(1, len(line)):
            out[x] = (int(line[x]) - int(line[x - 1])) & 0xFF
        return out

    def up_filter(line, prev):
        return (line.astype(int) - prev.astype(int)) & 0xFF

    def avg_filter(line, prev):
        out = []
        for x in range(len(line)):
            left = int(line[x - 1]) if x else 0
            out.append((int(line[x]) - (left + int(prev[x])) // 2) & 0xFF)
        return np.array(out)

    def paeth_filter(line, prev):
        out = []
        for x in range(len(line)):
            a = int(line[x - 1]) if x else 0
            b = int(prev[x])
            c = int(prev[x - 1]) if x else 0
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(line[x]) - pred) & 0xFF)
        return np.array(out)

    for ftype, filt in [(1, sub_filter), (2, up_filter),
                        (3, avg_filter), (4, paeth_filter)]:
        raw = bytearray()
        prev = np.zeros(4, dtype=np.uint8)
        for row in range(3):
            raw.append(ftype)
            raw += bytes(int(v) for v in filt(img[row], prev))
            prev = img[row]
        got = decode_png_pixels(_png_from_raw(4, 3, 0, bytes(raw)))
        assert (got[:, :, 0] == img).all(), f"filter {ftype}"


def test_resize_image_nearest_neighbor_exact():
    import numpy as np

    from project_graphdb_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png_pixels,
        resize_image,
    )

    # 4x4 gradient -> 2x2 nearest-neighbor picks rows/cols 0 and 2
    px = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = decode_png_pixels(resize_image(encode_png_pixels(px), 2, 2))
    assert (out[:, :, 0] == np.array([[0, 2], [8, 10]])).all()
    # upscale replicates source pixels
    up = decode_png_pixels(resize_image(encode_png_pixels(px), 8, 8))
    assert up.shape == (8, 8, 1)
    assert (up[::2, ::2, 0] == px[:, :, 0]).all()


def test_resize_rejects_jpeg_honestly():
    """JPEG entropy decode needs a codec library — still an honest
    NotImplementedError; GIF/BMP now decode for real."""
    from project_graphdb_spark.operators.multimodal import resize_image

    with pytest.raises(NotImplementedError, match="jpeg"):
        resize_image(encode_jpeg(4, 4), 2, 2)


def test_gif_pixel_roundtrip_exact():
    import numpy as np

    from project_graphdb_spark.operators.multimodal import (
        decode_gif_pixels,
        encode_gif_pixels,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (17, 23), (40, 47)]:
        px = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
        out = decode_gif_pixels(encode_gif_pixels(px))
        assert out.shape == (h, w, 1)
        assert (out == px).all()
    # LZW-friendly constant + repetitive data (dict growth exercised)
    px = np.tile(
        np.arange(256, dtype=np.uint8).reshape(16, 16)[:, :, None], (8, 8, 1)
    )
    assert (decode_gif_pixels(encode_gif_pixels(px)) == px).all()


def test_bmp_pixel_roundtrip_exact():
    import numpy as np

    from project_graphdb_spark.operators.multimodal import (
        decode_bmp_pixels,
        encode_bmp_pixels,
    )

    rng = np.random.default_rng(11)
    for c in (1, 3):
        for h, w in [(1, 1), (3, 5), (10, 13)]:  # 13 exercises padding
            px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
            out = decode_bmp_pixels(encode_bmp_pixels(px))
            assert out.shape == (h, w, c)
            assert (out == px).all()


def test_resize_parity_across_formats():
    """The same source pixels resized via PNG, GIF, and BMP payloads
    must produce the identical resized image."""
    import numpy as np

    from project_graphdb_spark.operators.multimodal import (
        decode_png_pixels,
        encode_bmp_pixels,
        encode_gif_pixels,
        encode_png_pixels,
        resize_image,
    )

    r = np.arange(20).reshape(-1, 1)
    c = np.arange(30).reshape(1, -1)
    px = ((7 * r + 13 * c + 5) % 256).astype(np.uint8)[:, :, None]
    outs = [
        decode_png_pixels(resize_image(enc(px), 8, 8))
        for enc in (encode_png_pixels, encode_gif_pixels, encode_bmp_pixels)
    ]
    assert (outs[0] == outs[1]).all() and (outs[0] == outs[2]).all()


def test_multidepth_png_rejected():
    from project_graphdb_spark.operators.multimodal import decode_png_pixels

    bad = _png_from_raw(2, 1, 3, b"\x00" + b"\x00" * 6)
    # corrupt the depth byte to 16
    bad = bytearray(bad)
    bad[24] = 16
    with pytest.raises(ValueError, match="unsupported"):
        decode_png_pixels(bytes(bad))


def test_wav_roundtrip_planted_params():
    """encode_wav → decode_wav recovers exactly the planted sample
    rate / channels / frames, and the square wave makes RMS == peak ==
    amplitude exactly (float64-exact by construction)."""
    from project_graphdb_spark.operators.multimodal import (
        _wav_params,
        decode_wav,
        encode_wav,
    )

    for doc_id in [0, 1, 7, 49, 50, 123, 4567]:
        n_frames, amplitude, n_channels = _wav_params(doc_id)
        meta = decode_wav(encode_wav(doc_id))
        assert meta["sample_rate"] == 8000
        assert meta["n_channels"] == n_channels
        assert meta["n_frames"] == n_frames
        assert meta["duration_s"] == n_frames / 8000.0
        assert meta["rms"] == float(amplitude)
        assert meta["peak"] == amplitude


def test_wav_decode_rejects_non_wav():
    import pytest

    from project_graphdb_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"definitely not RIFF data")
