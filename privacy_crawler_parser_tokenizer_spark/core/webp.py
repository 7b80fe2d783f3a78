"""Pure-stdlib WebP container metadata (RIFF 'WEBP': VP8 / VP8L / VP8X).

Pixel decode of WebP is out of scope in this sandbox — lossy VP8 needs
a boolean range entropy decoder and loop filter, lossless VP8L a
meta-Huffman + LZ77 + transform pipeline — so webp payloads keep the
labeled FakeCodec stand-in for features/resize.  Geometry, however, is
plain header arithmetic in all three variants, so ``decode_media``
reports REAL dimensions/alpha for webp:

- ``VP8 `` (lossy): 3-byte frame tag, keyframe start code 9D 01 2A,
  then 14-bit width/height (little-endian u16, low 14 bits).
- ``VP8L`` (lossless): signature byte 0x2F, then 14-bit width-1 /
  height-1 + alpha bit packed LSB-first.
- ``VP8X`` (extended): flag byte (alpha bit 0x10), then 24-bit
  little-endian canvas width-1 / height-1.

Kernel-module rules apply: plain Python, no Spark imports.
"""

from __future__ import annotations

import struct


class WebpError(ValueError):
    pass


def webp_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_channels) from the first image-bearing chunk."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("not a RIFF WEBP file")
    riff_end = min(8 + struct.unpack_from("<I", data, 4)[0], len(data))
    pos = 12
    while pos + 8 <= riff_end:
        fcc = data[pos : pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = pos + 8
        if body + size > riff_end:
            raise WebpError(f"chunk {fcc!r} overruns the container")
        chunk = data[body : body + size]
        if fcc == b"VP8 ":
            return _vp8_meta(chunk)
        if fcc == b"VP8L":
            return _vp8l_meta(chunk)
        if fcc == b"VP8X":
            return _vp8x_meta(chunk)
        pos = body + size + (size & 1)
    raise WebpError("no VP8/VP8L/VP8X chunk")


def _vp8_meta(chunk: bytes) -> tuple[int, int, int]:
    if len(chunk) < 10:
        raise WebpError("short VP8 chunk")
    if chunk[0] & 0x01:  # frame tag bit 0: 0 = keyframe (carries geometry)
        raise WebpError("VP8 interframe carries no geometry")
    if chunk[3:6] != b"\x9d\x01\x2a":
        raise WebpError("bad VP8 keyframe start code")
    width = struct.unpack_from("<H", chunk, 6)[0] & 0x3FFF
    height = struct.unpack_from("<H", chunk, 8)[0] & 0x3FFF
    if width == 0 or height == 0:
        raise WebpError("zero VP8 geometry")
    return width, height, 3


def _vp8l_meta(chunk: bytes) -> tuple[int, int, int]:
    if len(chunk) < 5:
        raise WebpError("short VP8L chunk")
    if chunk[0] != 0x2F:
        raise WebpError("bad VP8L signature")
    bits = struct.unpack_from("<I", chunk, 1)[0]
    width = (bits & 0x3FFF) + 1
    height = ((bits >> 14) & 0x3FFF) + 1
    alpha = (bits >> 28) & 0x1
    return width, height, 4 if alpha else 3


def _vp8x_meta(chunk: bytes) -> tuple[int, int, int]:
    if len(chunk) < 10:
        raise WebpError("short VP8X chunk")
    alpha = chunk[0] & 0x10
    width = int.from_bytes(chunk[4:7], "little") + 1
    height = int.from_bytes(chunk[7:10], "little") + 1
    return width, height, 4 if alpha else 3
