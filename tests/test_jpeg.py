"""Baseline JPEG codec tests (core/jpeg.py) and multimodal wiring.

Verification strategy (no reference codec in this container):
* the 2-D DCT is checked against a brute-force four-loop cosine sum
  written here, independent of the matrix formulation;
* canonical Huffman code construction is checked against hand-computed
  codes for a small BITS/HUFFVAL example;
* encode->decode roundtrips must reproduce smooth images within
  quantization tolerance and the DC-only case exactly;
* a 4:2:0 subsampled stream and a restart-interval stream are built BY
  THE TEST (independent minimal writer) and must decode to the
  expected planes.
"""

import math
import struct

import numpy as np
import pytest

from privacy_crawler_parser_tokenizer_spark.core import jpeg as J


def _smooth(rng, h, w, c):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(yy / 7.0) + 50 * np.cos(xx / 9.0))[:, :, None]
    return np.clip(base + rng.integers(-8, 8, (h, w, c)), 0, 255).astype(
        np.uint8
    )


def test_dct_matches_brute_force():
    rng = np.random.default_rng(0)
    blk = rng.integers(0, 256, (8, 8)).astype(float)
    got = J.dct2(blk)
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = sum(
                blk[x, y]
                * math.cos((2 * x + 1) * u * math.pi / 16)
                * math.cos((2 * y + 1) * v * math.pi / 16)
                for x in range(8)
                for y in range(8)
            )
            cu = math.sqrt(1 / 8) if u == 0 else 0.5
            cv = math.sqrt(1 / 8) if v == 0 else 0.5
            want[u, v] = cu * cv * s
    assert np.abs(got - want).max() < 1e-9
    assert np.abs(J.idct2(got) - blk).max() < 1e-9


def test_zigzag_is_the_standard_order():
    # spot-check the well-known head and tail of the zigzag sequence
    assert list(J.ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(J.ZIGZAG[-4:]) == [47, 55, 62, 63]
    assert sorted(J.ZIGZAG) == list(range(64))


def test_canonical_huffman_hand_example():
    # BITS: two codes of length 2, one of length 3 -> canonical codes
    # 00, 01, 100 (T.81 Annex C worked construction)
    bits = [0, 2, 1] + [0] * 13
    codes = J._canonical_codes(bits, [7, 8, 9])
    assert codes == {7: (0b00, 2), 8: (0b01, 2), 9: (0b100, 3)}
    with pytest.raises(J.JpegError):
        J._canonical_codes([2] + [0] * 15, [1, 2, 3])  # length mismatch
    with pytest.raises(J.JpegError):
        J._canonical_codes([3] + [0] * 15, [1, 2, 3])  # 3 codes of len 1


@pytest.mark.parametrize("shape", [(16, 24, 3), (8, 8, 1), (33, 17, 3),
                                   (1, 1, 3), (5, 3, 1)])
def test_roundtrip_within_quantization_tolerance(shape):
    rng = np.random.default_rng(sum(shape))
    px = _smooth(rng, *shape)
    blob = J.encode_jpeg(px, quality=95)
    assert J.jpeg_meta(blob) == (shape[1], shape[0], shape[2])
    back = J.decode_jpeg(blob)
    assert back.shape == shape
    err = np.abs(back.astype(int) - px.astype(int))
    assert err.max() <= 16 and err.mean() <= 4.0


def test_flat_image_roundtrips_exactly():
    # a constant block is pure DC: quantization cannot move it
    px = np.full((24, 16, 3), 200, dtype=np.uint8)
    assert np.array_equal(J.decode_jpeg(J.encode_jpeg(px)), px)


def test_error_paths():
    bad = [
        b"",
        b"\xff\xd8",                       # SOI only
        b"\x89PNG\r\n\x1a\n",              # not a JPEG
        b"\xff\xd8\xff\xdb\x00\x02",       # truncated DQT
    ]
    for b in bad:
        with pytest.raises(J.JpegError):
            J.jpeg_meta(b)
        with pytest.raises(J.JpegError):
            J.decode_jpeg(b)
    # progressive: meta parses, decode refuses
    px = _smooth(np.random.default_rng(1), 8, 8, 1)
    blob = bytearray(J.encode_jpeg(px))
    i = blob.index(b"\xff\xc0")
    blob[i + 1] = 0xC2                     # rewrite SOF0 -> SOF2
    assert J.jpeg_meta(bytes(blob)) == (8, 8, 1)
    with pytest.raises(J.JpegError):
        J.decode_jpeg(bytes(blob))


# ------------------------- independent minimal writer (test-side) ----


def _write_scan_blocks(writer, blocks, qtab, dc_codes, ac_codes, pred):
    """Encode a list of 8x8 sample blocks for ONE component using the
    module's public entropy primitives is avoided — this re-implements
    coefficient coding with its own loop to stay independent."""
    for blk in blocks:
        coeffs = J.dct2(blk.astype(float) - 128.0)
        zz = np.round(coeffs.reshape(64) / qtab).astype(int)[J.ZIGZAG]
        diff = int(zz[0]) - pred[0]
        pred[0] = int(zz[0])
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(diff if diff >= 0 else diff + (1 << size) - 1, size)
        nz = np.nonzero(zz[1:])[0]
        last = (nz[-1] + 1) if len(nz) else 0
        k = 1
        while k <= last:
            run = 0
            while zz[k] == 0:
                run += 1
                k += 1
            while run > 15:
                c2, l2 = ac_codes[0xF0]
                writer.write(c2, l2)
                run -= 16
            v = int(zz[k])
            s2 = abs(v).bit_length()
            c2, l2 = ac_codes[(run << 4) | s2]
            writer.write(c2, l2)
            writer.write(v if v >= 0 else v + (1 << s2) - 1, s2)
            k += 1
        if last < 63:
            c2, l2 = ac_codes[0x00]
            writer.write(c2, l2)


def _build_420_jpeg(y_plane, cb_plane, cr_plane, qtab, restart=0):
    """Independent minimal 4:2:0 writer: 16x16 luma per MCU (four Y
    blocks) + one 8x8 Cb + one 8x8 Cr; optional restart interval."""
    h, w = y_plane.shape
    assert h % 16 == 0 and w % 16 == 0
    ch, cw = h // 2, w // 2
    assert cb_plane.shape == (ch, cw) == cr_plane.shape

    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._canonical_codes(J._AC_BITS, J._AC_VALS)
    writer = J._BitWriter()
    preds = {"y": [0], "cb": [0], "cr": [0]}
    mcu_i = 0
    chunks = []
    for my in range(h // 16):
        for mx in range(w // 16):
            if restart and mcu_i and mcu_i % restart == 0:
                chunks.append(writer.flush())
                writer = J._BitWriter()
                preds = {"y": [0], "cb": [0], "cr": [0]}
            yblocks = [
                y_plane[my * 16 + by * 8 : my * 16 + by * 8 + 8,
                        mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8]
                for by in range(2) for bx in range(2)
            ]
            _write_scan_blocks(writer, yblocks, qtab, dc_codes, ac_codes,
                               preds["y"])
            _write_scan_blocks(writer, [cb_plane[my * 8 : my * 8 + 8,
                                                 mx * 8 : mx * 8 + 8]],
                               qtab, dc_codes, ac_codes, preds["cb"])
            _write_scan_blocks(writer, [cr_plane[my * 8 : my * 8 + 8,
                                                 mx * 8 : mx * 8 + 8]],
                               qtab, dc_codes, ac_codes, preds["cr"])
            mcu_i += 1
    chunks.append(writer.flush())
    entropy = bytearray(chunks[0])
    for i, c in enumerate(chunks[1:]):
        entropy += bytes([0xFF, 0xD0 + (i % 8)]) + c

    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(int(v) for v in qtab[J.ZIGZAG])
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)   # Y: 2x2 sampling
    sof += struct.pack(">BBB", 2, 0x11, 0)
    sof += struct.pack(">BBB", 3, 0x11, 0)
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    dht = bytes([0x00]) + bytes(J._DC_BITS) + bytes(J._DC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    dht = bytes([0x10]) + bytes(J._AC_BITS) + bytes(J._AC_VALS)
    out += b"\xff\xc4" + struct.pack(">H", len(dht) + 2) + dht
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("restart", [0, 1, 3])
def test_decode_420_subsampled_with_restarts(restart):
    """Chroma-subsampled stream from the independent writer: decoded Y
    must match the luma plane (flat chroma -> exact gray levels), and
    chroma must upsample 2x2."""
    rng = np.random.default_rng(5 + restart)
    h, w = 32, 48
    # piecewise-constant 8x8 tiles: pure DC, exact through quantization
    tiles = rng.integers(40, 216, (h // 8, w // 8)).astype(np.float64)
    y = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    cb = np.full((h // 2, w // 2), 128.0)
    cr = np.full((h // 2, w // 2), 128.0)
    qtab = np.ones(64, dtype=np.int64)   # lossless-ish for DC-only data

    blob = _build_420_jpeg(y, cb, cr, qtab, restart=restart)
    assert J.jpeg_meta(blob) == (w, h, 3)
    out = J.decode_jpeg(blob)
    assert out.shape == (h, w, 3)
    # neutral chroma: R == G == B == Y
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    assert np.array_equal(out[:, :, 1], out[:, :, 2])
    assert np.abs(out[:, :, 0].astype(float) - y).max() <= 1


def test_decode_420_chroma_upsampling():
    h, w = 16, 16
    y = np.full((h, w), 128.0)
    # 8x8-tile chroma: each chroma block pure DC, upsampled 2x2
    cb = np.full((8, 8), 180.0)
    cr = np.full((8, 8), 90.0)
    blob = _build_420_jpeg(y, cb, cr, np.ones(64, dtype=np.int64))
    out = J.decode_jpeg(blob).astype(float)
    r = 128 + 1.402 * (90 - 128)
    b = 128 + 1.772 * (180 - 128)
    assert abs(out[:, :, 0].mean() - r) < 1.5
    assert abs(out[:, :, 2].mean() - b) < 1.5


# ------------------------------------------------------- Spark wiring


def test_decode_media_real_jpeg_dims(spark):
    from privacy_crawler_parser_tokenizer_spark.functions import multimodal as mm

    rng = np.random.default_rng(13)
    px = _smooth(rng, 24, 10, 3)
    media = spark.createDataFrame(
        [("a", "media://a", "jpeg", bytearray(J.encode_jpeg(px))),
         ("b", "media://b", "webp", bytearray(b"RIFF....WEBP"))],
        mm.MEDIA_SCHEMA,
    )
    got = {r.media_ref: r for r in mm.decode_media(media).collect()}
    assert (got["media://a"].width, got["media://a"].height,
            got["media://a"].n_channels, got["media://a"].ok) == (10, 24, 3, True)
    assert not got["media://b"].ok


def test_resize_media_real_jpeg_pixels(spark):
    """resize_media re-encodes JPEG with truly resampled pixels: the
    output decodes to the nearest-neighbor resample within JPEG
    quantization tolerance."""
    from privacy_crawler_parser_tokenizer_spark.core import png
    from privacy_crawler_parser_tokenizer_spark.functions import multimodal as mm

    rng = np.random.default_rng(17)
    src = _smooth(rng, 120, 60, 3)
    media = spark.createDataFrame(
        [("a", "media://a", "jpeg", bytearray(J.encode_jpeg(src, quality=95)))],
        mm.MEDIA_SCHEMA,
    )
    got = mm.resize_media(media, max_side=60).collect()[0]
    assert (got.width, got.height) == (30, 60)
    out = J.decode_jpeg(bytes(got.content))
    want = png.resize_nearest(J.decode_jpeg(J.encode_jpeg(src, quality=95)),
                              30, 60)
    err = np.abs(out.astype(int) - want.astype(int))
    assert err.mean() <= 6.0


# ------------------------------------------------- progressive (SOF2)


def test_progressive_equals_baseline_pixels():
    # Same quantizer on both paths -> identical coefficients -> the
    # decoded pixels must match EXACTLY, not just approximately.
    rng = np.random.default_rng(5)
    for shape, q in [((8, 8, 1), 90), ((20, 24, 3), 90), ((17, 9, 3), 50),
                     ((40, 33, 3), 75), ((33, 31, 1), 95)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=q))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=q))
        assert (base == prog).all(), (shape, q)


def test_progressive_smooth_image_many_eobs():
    # gradients leave long zero tails -> EOB / ZRL paths in every scan
    y, x = np.mgrid[0:48, 0:40]
    img = ((y * 3 + x * 2) % 256).astype(np.uint8)
    base = J.decode_jpeg(J.encode_jpeg(img, quality=60))
    prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=60))
    assert (base == prog).all()


def test_progressive_meta_and_close_to_source():
    img = np.full((16, 16, 3), 128, np.uint8)
    img[4:12, 4:12] = [200, 40, 90]
    data = J.encode_jpeg_progressive(img, quality=95)
    assert J.jpeg_meta(data) == (16, 16, 3)
    out = J.decode_jpeg(data)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12


# the embedded encoder table has no EOBn (n>0) symbols — hand-packed
# EOB-run scans use this tiny AC table instead (5 codes, length 3)
_EOB_AC_BITS = [0, 0, 5] + [0] * 13
_EOB_AC_VALS = [0x00, 0x01, 0x02, 0x10, 0xF0]


def _progressive_shell(scans, eob_table=False):
    """Minimal 16x8 grayscale progressive container around hand-built
    scan payloads: [(sos_bytes, entropy_bytes), ...]."""
    out = bytearray(b"\xff\xd8")
    tbl = np.ones(64, dtype=np.int64)
    body = bytes([0]) + bytes(int(v) for v in tbl)
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
    if eob_table:
        out += J._dht_segment(1, 0, _EOB_AC_BITS, _EOB_AC_VALS)
    else:
        out += J._dht_segment(1, 0, J._AC_BITS, J._AC_VALS)
    for sos_body, entropy in scans:
        out += b"\xff\xda" + struct.pack(">H", len(sos_body) + 2) + sos_body
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_eob_run_skips_blocks():
    # Two blocks; the AC-first scan ends block 1 with EOB1 (eobrun=1),
    # so block 2 is skipped entirely — the decoder path the in-repo
    # encoder (EOB0-only) never produces.
    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._canonical_codes(_EOB_AC_BITS, _EOB_AC_VALS)
    w = J._BitWriter()
    for _ in range(2):          # DC scan (Ss=0, Ah=0, Al=0): both DC=0
        code, length = dc_codes[0]
        w.write(code, length)
    dc_entropy = w.flush()
    w = J._BitWriter()
    code, length = ac_codes[0x02]   # block 1: AC k=1, size 2
    w.write(code, length)
    w.write(0b11, 2)                # value +3 (big enough to survive
    #                                 rounding after the IDCT)
    code, length = ac_codes[0x10]   # EOBn with run=1
    w.write(code, length)
    w.write(0, 1)                   # extra bit 0 -> eobrun = 1
    ac_entropy = w.flush()
    data = _progressive_shell([
        (bytes([1, 1, 0x00, 0, 0, 0x00]), dc_entropy),
        (bytes([1, 1, 0x00, 1, 63, 0x00]), ac_entropy),
    ], eob_table=True)
    out = J.decode_jpeg(data)
    assert out.shape == (8, 16, 1)
    # block 1 carries one AC coefficient, block 2 is flat 128
    assert (out[:, 8:, 0] == 128).all()
    assert out[:, :8, 0].std() > 0


def test_progressive_refine_eob_run_corrections():
    # AC-first gives both blocks a coef at k=1 (value 2 at Al=1 -> raw
    # 2<<1=4); the refine scan emits EOB1 immediately in block 1, so
    # BOTH blocks take the corrections-only path; correction bit 1
    # grows each coefficient's magnitude by 1.
    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._canonical_codes(_EOB_AC_BITS, _EOB_AC_VALS)
    w = J._BitWriter()
    for _ in range(2):
        code, length = dc_codes[0]
        w.write(code, length)
    dc_entropy = w.flush()
    w = J._BitWriter()
    for _ in range(2):              # per block: k=1 value +2, then EOB0
        code, length = ac_codes[0x02]
        w.write(code, length)
        w.write(0b10, 2)            # +2
        code, length = ac_codes[0x00]
        w.write(code, length)
    first_entropy = w.flush()
    w = J._BitWriter()
    code, length = ac_codes[0x10]   # EOB1 immediately (block 1 + skip 1)
    w.write(code, length)
    w.write(0, 1)
    w.write(1, 1)                   # correction bit for block 1's coef
    w.write(1, 1)                   # correction bit for block 2's coef
    refine_entropy = w.flush()
    data = _progressive_shell([
        (bytes([1, 1, 0x00, 0, 0, 0x00]), dc_entropy),
        (bytes([1, 1, 0x00, 1, 63, 0x01]), first_entropy),   # Al=1
        (bytes([1, 1, 0x00, 1, 63, 0x10]), refine_entropy),  # Ah=1,Al=0
    ], eob_table=True)
    out = J.decode_jpeg(data)
    # raw coef 4 refined to 5: IDCT of a single AC basis differs from
    # the unrefined value -> just assert both blocks decoded identically
    # and are non-flat (corrections were consumed in both paths)
    assert (out[:, :8, 0] == out[:, 8:, 0]).all()
    assert out[:, :8, 0].std() > 0


def test_progressive_rejects_bad_scan_headers():
    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    w = J._BitWriter()
    for _ in range(2):
        code, length = dc_codes[0]
        w.write(code, length)
    ent = w.flush()
    with pytest.raises(J.JpegError):  # DC scan with Se != 0
        J.decode_jpeg(_progressive_shell([(bytes([1, 1, 0, 0, 5, 0]), ent)]))
    with pytest.raises(J.JpegError):  # AC scan with Ss > Se
        J.decode_jpeg(_progressive_shell([
            (bytes([1, 1, 0, 0, 0, 0]), ent),
            (bytes([1, 1, 0, 9, 5, 0]), b"\x00"),
        ]))


def test_progressive_420_subsampled_matches_baseline():
    """Hand-built progressive 4:2:0 stream (interleaved DC scan +
    per-component EOB-only AC scans over each component's OWN
    ceil(dim/8) grid) must decode identically to the proven baseline
    writer's stream carrying the same coefficients."""
    rng = np.random.default_rng(9)
    h, w = 32, 48
    tiles = rng.integers(40, 216, (h // 8, w // 8)).astype(np.float64)
    y = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    cb = np.full((h // 2, w // 2), 128.0)
    cr = np.full((h // 2, w // 2), 128.0)
    qtab = np.ones(64, dtype=np.int64)
    ref = J.decode_jpeg(_build_420_jpeg(y, cb, cr, qtab, restart=0))

    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ac_codes = J._canonical_codes(J._AC_BITS, J._AC_VALS)

    def dc_of(plane, by, bx):
        block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
        return int(round(J.dct2(block - 128.0)[0, 0]))

    wtr = J._BitWriter()
    preds = [0, 0, 0]

    def emit_dc(ci, v):
        diff = v - preds[ci]
        preds[ci] = v
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        wtr.write(code, length)
        if size:
            wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)

    for my in range(h // 16):
        for mx in range(w // 16):
            for by in range(2):
                for bx in range(2):
                    emit_dc(0, dc_of(y, my * 2 + by, mx * 2 + bx))
            emit_dc(1, dc_of(cb, my, mx))
            emit_dc(2, dc_of(cr, my, mx))
    dc_entropy = wtr.flush()

    def eob_scan(nblocks):
        wr = J._BitWriter()
        code, length = ac_codes[0x00]
        for _ in range(nblocks):
            wr.write(code, length)
        return wr.flush()

    out = bytearray(b"\xff\xd8")
    body = bytes([0]) + bytes(int(v) for v in qtab[J.ZIGZAG])
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += struct.pack(">BBB", 1, 0x22, 0)
    sof += struct.pack(">BBB", 2, 0x11, 0)
    sof += struct.pack(">BBB", 3, 0x11, 0)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
    out += J._dht_segment(1, 0, J._AC_BITS, J._AC_VALS)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x00, 3, 0x00]) + bytes([0, 0, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += dc_entropy
    for cid, nblocks in ((1, (h // 8) * (w // 8)),
                         (2, (h // 16) * (w // 16)),
                         (3, (h // 16) * (w // 16))):
        sos = bytes([1, cid, 0x00]) + bytes([1, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += eob_scan(nblocks)
    out += b"\xff\xd9"

    got = J.decode_jpeg(bytes(out))
    assert np.array_equal(got, ref)


@pytest.mark.parametrize("quality", [35, 75, 95])
def test_progressive_equality_hypothesis_breadth(quality):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=12, deadline=None)
    @given(st.integers(1, 3), st.integers(1, 40), st.integers(1, 40),
           st.integers(0, 2**32 - 1))
    def inner(ch, h, w, seed):
        rng = np.random.default_rng(seed)
        shape = (h, w, 3) if ch == 3 else (h, w, 1)
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        base = J.decode_jpeg(J.encode_jpeg(img, quality=quality))
        prog = J.decode_jpeg(J.encode_jpeg_progressive(img, quality=quality))
        assert (base == prog).all()

    inner()


def test_progressive_restart_interval_resets_state():
    # DRI + RST markers inside a progressive DC scan: predictors must
    # reset at each restart (decoder path not exercised by the in-repo
    # encoder, which never emits DRI).
    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)

    def emit_dc(wtr, diff):
        size = abs(diff).bit_length()
        code, length = dc_codes[size]
        wtr.write(code, length)
        if size:
            wtr.write(diff if diff >= 0 else diff + (1 << size) - 1, size)

    # 2 blocks, restart_interval=1: each block's DC is coded as a diff
    # against a RESET predictor (0), so both diffs are absolute values.
    w1 = J._BitWriter(); emit_dc(w1, 100)   # block 1: DC 100
    w2 = J._BitWriter(); emit_dc(w2, -50)   # block 2: DC -50 (pred reset)
    entropy = w1.flush() + b"\xff\xd0" + w2.flush()
    ac = J._BitWriter()
    code, length = J._canonical_codes(J._AC_BITS, J._AC_VALS)[0x00]
    ac.write(code, length); ac.write(code, length)  # EOB both blocks

    out = bytearray(b"\xff\xd8")
    tbl = np.ones(64, dtype=np.int64)
    body = bytes([0]) + bytes(int(v) for v in tbl)
    out += b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)   # DRI = 1 MCU
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + struct.pack(">BBB", 1, 0x11, 0)
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
    out += J._dht_segment(1, 0, J._AC_BITS, J._AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 0, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += entropy
    sos = bytes([1, 1, 0x00, 1, 63, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += ac.flush()
    out += b"\xff\xd9"

    px = J.decode_jpeg(bytes(out))
    # DC 100 -> 128 + 100/8 = 140.5; DC -50 -> 128 - 6.25 = 121.75
    assert abs(int(px[0, 0, 0]) - 141) <= 1
    assert abs(int(px[0, 8, 0]) - 122) <= 1
