"""WebP container metadata tests (core/webp.py) — headers hand-packed
by the test; pixel decode is intentionally out of scope (entropy
decoders), so only geometry/alpha extraction is claimed or verified."""

import struct

import numpy as np
import pytest

from privacy_crawler_parser_tokenizer_spark.core import webp
from privacy_crawler_parser_tokenizer_spark.functions import multimodal as mm


def _riff(*chunks):
    body = b"WEBP"
    for fcc, payload in chunks:
        body += fcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _vp8_chunk(w, h):
    # 3-byte frame tag (keyframe: bit0=0) + start code + 14-bit w/h
    return (b"\x00\x00\x00" + b"\x9d\x01\x2a"
            + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + b"\x00" * 8)


def _vp8l_chunk(w, h, alpha=0):
    bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
    return b"\x2f" + struct.pack("<I", bits) + b"\x00" * 4


def _vp8x_chunk(w, h, alpha=False):
    flags = 0x10 if alpha else 0
    return (bytes((flags,)) + b"\x00\x00\x00"
            + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))


def test_vp8_lossy_geometry():
    data = _riff((b"VP8 ", _vp8_chunk(320, 240)))
    assert webp.webp_meta(data) == (320, 240, 3)


def test_vp8l_lossless_geometry_and_alpha():
    assert webp.webp_meta(_riff((b"VP8L", _vp8l_chunk(17, 9)))) == (17, 9, 3)
    assert webp.webp_meta(_riff((b"VP8L", _vp8l_chunk(16383, 1, alpha=1)))) == (
        16383, 1, 4)


def test_vp8x_extended_canvas():
    data = _riff((b"VP8X", _vp8x_chunk(70000, 3, alpha=True)),
                 (b"VP8 ", _vp8_chunk(70000 & 0x3FFF, 3)))
    assert webp.webp_meta(data) == (70000, 3, 4)


def test_skips_leading_metadata_chunks():
    data = _riff((b"EXIF", b"\x01\x02\x03"), (b"VP8 ", _vp8_chunk(8, 6)))
    assert webp.webp_meta(data) == (8, 6, 3)


def test_rejects_garbage_truncation_and_interframe():
    good = _riff((b"VP8 ", _vp8_chunk(8, 6)))
    inter = b"\x01\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 8, 6)
    for bad in (b"", b"RIFF\x04\x00\x00\x00AVI ", good[:14],
                _riff((b"ALPH", b"\x00\x00")),
                _riff((b"VP8 ", b"\x00\x00\x00bad!" + b"\x00" * 6)),
                _riff((b"VP8 ", inter))):
        with pytest.raises(webp.WebpError):
            webp.webp_meta(bad)


def test_decode_media_reports_real_webp_geometry(spark):
    real = _riff((b"VP8L", _vp8l_chunk(33, 21, alpha=1)))
    media = spark.createDataFrame(
        [("d1", "media://d1", "webp", bytearray(real)),
         ("d2", "media://d2", "webp", bytearray(b"\x01\x02" * 40))],
        schema=mm.MEDIA_SCHEMA,
    )
    rows = {r["doc_id"]: r for r in mm.decode_media(media).collect()}
    assert (rows["d1"]["width"], rows["d1"]["height"]) == (33, 21)
    assert rows["d1"]["n_channels"] == 4 and rows["d1"]["ok"]
    assert not rows["d2"]["ok"]  # garbage stays labeled fake-path
