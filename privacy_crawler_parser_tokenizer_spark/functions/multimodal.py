"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs —
the north rule's "interleaved text + media" documents carry
``kind='media'`` spans whose ``media_ref`` points into a ``media``
table:

    media(doc_id STRING, media_ref STRING, fmt STRING, content BINARY)

Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
UDF signatures) is real and tested.  The codec chain in ``_decode_one``
is: Pillow if present (absent in this container) -> the pure-stdlib
codecs (``core/png.py`` — RFC 2083 PNG; ``core/bitmaps.py`` — BMP and
netpbm PPM/PGM; ``core/jpeg.py`` — JPEG, baseline AND progressive/SOF2; ``core/gif.py`` —
GIF87a/89a incl. animation; ``core/wav.py`` — RIFF PCM audio;
``core/webp.py`` — lossless WebP/VP8L incl. all four transforms: REAL
decode/resize/encode for all seven) -> ``FakeCodec``, a deterministic,
clearly-marked stand-in for the one remaining bitstream (lossy-VP8
webp — its boolean range coder + loop filter stay out of scope) that
derives dimensions/features from a content hash so tests are
reproducible (geometry for lossy VP8 is still REAL, from the header).
``frame_sample_media`` decodes REAL frames from animated GIFs, APNGs,
animated WebP, and AVI videos (``core/avi.py`` — RIFF container with
MJPEG frames via the JPEG DCT path, or uncompressed DIB frames), plus
decodable stills as one-frame animations, and yields one labeled
``ok=false`` NULL-content row for the rest (never fake bytes);
``media_features`` computes REAL PCM features (duration/RMS/peak/ZCR +
spectral bands) for WAV payloads, REAL pixel features (log-area,
aspect, luminance stats + histogram) for decodable images, and falls
back to the byte-histogram embedding only for undecodable bytes.
Swapping in a full decoder touches only ``_decode_one`` /
``resize_media``'s codec table.

Scale notes: decode/feature stages are ``mapInPandas`` over the media
table repartitioned by ``media_ref`` hash (bytes never shuffle twice);
features come back as fixed-width ``array<float>`` ready for the ANN
operators in queries.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core import apng, avi, bitmaps, gif, jpeg, png, wav, webp

try:  # full external codec, absent in this container; probed ONCE —
    # a failed import is not cached by Python, so probing per row
    # would pay a sys.path scan on every record
    import io as _io

    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None

MEDIA_SCHEMA = "doc_id string, media_ref string, fmt string, content binary"

DECODED_SCHEMA = (
    "doc_id string, media_ref string, fmt string, width int, height int, "
    "n_channels int, n_bytes long, ok boolean"
)

FEATURE_DIM = 16
FEATURES_SCHEMA = (
    "doc_id string, media_ref string, feature array<float>"
)


class FakeCodec:
    """Deterministic stand-in for an image codec (STUB — no Pillow in
    this container).  Dimensions/channels derive from a content hash so
    every engine run and test sees identical values."""

    @staticmethod
    def decode(content: bytes) -> tuple[int, int, int]:
        h = hashlib.sha256(content or b"").digest()
        width = 16 + h[0] * 4
        height = 16 + h[1] * 4
        channels = 1 + h[2] % 4
        return width, height, channels

    @staticmethod
    def features(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
        """Byte-histogram 'embedding': real feature-extractor batch
        shape, deterministic values."""
        arr = np.frombuffer(content or b"\x00", dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
        total = hist.sum() or 1
        return (hist / total).astype(np.float32)


def _decode_one(content: bytes) -> tuple[int, int, int, bool]:
    if _PILImage is not None:  # full codec path (any format)
        try:
            img = _PILImage.open(_io.BytesIO(content))
            return img.width, img.height, len(img.getbands()), True
        except Exception:
            pass
    try:  # REAL pure-stdlib PNG path (core/png.py): true dimensions
        # and channel count from IHDR, no inflate needed for metadata
        return (*png.png_meta(content), True)
    except png.PngError:
        pass
    # REAL BMP / PPM / baseline-JPEG / GIF metadata paths
    for meta, err in (
        (bitmaps.bmp_meta, bitmaps.BitmapError),
        (bitmaps.pnm_meta, bitmaps.BitmapError),
        (jpeg.jpeg_meta, jpeg.JpegError),
        (gif.gif_meta, gif.GifError),
    ):
        try:
            return (*meta(content), True)
        except err:
            pass
    try:  # REAL WAV audio: (frames, channels, rate) maps to the
        # image-shaped schema as width=frames, height=1
        frames, channels, _rate = wav.wav_meta(content)
        return frames, 1, channels, True
    except wav.WavError:
        pass
    try:  # REAL AVI video: container-header geometry (no frame decode)
        return (*avi.avi_meta(content), True)
    except avi.AviError:
        pass
    try:  # REAL WebP geometry from VP8/VP8L/VP8X headers (VP8L pixel
        # decode is also real — see resize/frame paths; lossy VP8 pixel
        # decode stays out of scope but its header geometry is true)
        return (*webp.webp_meta(content), True)
    except webp.WebpError:
        pass
    w, h, c = FakeCodec.decode(content)
    return w, h, c, False


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media fixtures from the documents table: the text
    bytes become the opaque payload (tests/benches only)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(F.lit("media://"), F.col("doc_id").cast("string")).alias("media_ref"),
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "jpeg")
        .otherwise("webp")
        .alias("fmt"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
    )


def decode_media(media: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """media table -> decoded metadata via mapInPandas (one Python call
    per Arrow batch; bytes stay executor-side)."""

    def run(batches):
        for pdf in batches:
            meta = [
                _decode_one(bytes(c) if c is not None else b"")
                for c in pdf["content"]
            ]
            out = pd.DataFrame(
                meta, columns=["width", "height", "n_channels", "ok"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_ref", pdf["media_ref"].values)
            out.insert(2, "fmt", pdf["fmt"].values)
            out["n_bytes"] = [
                len(c) if c is not None else 0 for c in pdf["content"]
            ]
            yield out[
                ["doc_id", "media_ref", "fmt", "width", "height",
                 "n_channels", "n_bytes", "ok"]
            ]

    df = media
    if n_partitions:
        df = df.repartition(n_partitions, F.hash("media_ref"))
    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def _wav_features(raw: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL audio features from decoded PCM: [duration_s, rms, peak,
    zero-crossing-rate] + (dim-4) equal-width spectral band energy
    fractions from an rFFT of the mono mix.  Deterministic; raises
    ``wav.WavError`` for non-WAV payloads (callers fall back)."""
    samples, rate = wav.decode_wav(raw)
    if samples.shape[0] == 0:
        raise wav.WavError("empty PCM stream")
    mono = samples.astype(np.float64)
    if samples.dtype == np.uint8:
        mono = (mono - 128.0) / 128.0
    elif samples.dtype == np.dtype("<i2"):
        mono = mono / 32768.0
    mono = mono.mean(axis=1)
    n = mono.shape[0]
    duration = n / rate
    rms = float(np.sqrt(np.mean(mono * mono)))
    peak = float(np.abs(mono).max())
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    n_bands = dim - 4
    power = np.abs(np.fft.rfft(mono)) ** 2
    total = power.sum() or 1.0
    edges = np.linspace(0, power.shape[0], n_bands + 1).astype(int)
    bands = [power[edges[i] : edges[i + 1]].sum() / total for i in range(n_bands)]
    return np.asarray([duration, rms, peak, zcr] + bands, dtype=np.float32)


def _image_features(raw: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """REAL image features from decoded pixels: [log-area, aspect,
    mean luminance, luminance std] + (dim-4) equal-width luminance
    histogram fractions.  Raises ``ValueError`` (the codec errors all
    subclass it) when no pure-stdlib decoder accepts the payload."""
    px = None
    for decode in (png.decode_png, bitmaps.decode_bmp, bitmaps.decode_pnm,
                   jpeg.decode_jpeg, webp.decode_webp,
                   lambda r: gif.decode_gif(r)[0],       # animations:
                   lambda r: webp.webp_frames(r)[0],     # features from
                   lambda r: avi.decode_avi(r)[0]):      # the first frame
        try:
            px = decode(raw)
            break
        except ValueError:
            continue
    if px is None:
        raise ValueError("no decodable image payload")
    if px.ndim == 2:
        lum = px.astype(np.float64)
    elif px.shape[2] >= 3:
        lum = (0.299 * px[..., 0].astype(np.float64)
               + 0.587 * px[..., 1] + 0.114 * px[..., 2])
    else:  # gray(+alpha)
        lum = px[..., 0].astype(np.float64)
    h, w = lum.shape
    hist, _ = np.histogram(lum, bins=dim - 4, range=(0.0, 256.0))
    total = hist.sum() or 1
    head = [np.log1p(float(h * w)), w / h,
            float(lum.mean()) / 255.0, float(lum.std()) / 255.0]
    return np.asarray(head + (hist / total).tolist(), dtype=np.float32)


def media_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """media table -> fixed-width float features (ANN-ready).  WAV
    payloads take the REAL PCM-feature path, decodable images (PNG/
    BMP/PPM/JPEG/GIF/lossless-WebP) the REAL pixel-feature path;
    only undecodable payloads keep the deterministic byte-histogram
    embedding (the labeled stand-in)."""

    def one(raw: bytes) -> list:
        try:
            return _wav_features(raw, dim).tolist()
        except wav.WavError:
            pass
        try:
            return _image_features(raw, dim).tolist()
        except ValueError:
            return FakeCodec.features(raw, dim).tolist()

    def run(batches):
        for pdf in batches:
            feats = [
                one(bytes(c) if c is not None else b"") for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id string, media_ref string, fmt string, width int, height int, "
    "scale double, content binary"
)


def resize_media(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Bounded resize: scale every image so its longer side is <=
    ``max_side`` (aspect preserved, never upscaled).

    PNG, BMP, PPM/PGM, baseline-JPEG and lossless-WebP stills take the
    REAL path end to end: ``core/png.py`` / ``core/bitmaps.py`` /
    ``core/jpeg.py`` / ``core/webp.py`` decode the pixels,
    nearest-neighbor resample them to the new geometry, and re-encode
    in the same format — output content round-trips through the
    matching decoder (JPEG lossily, within quantization tolerance).
    Animations resize EVERY frame and re-encode in-format too: GIF
    (resampled palettes stay subsets, so re-encode is exact), APNG,
    animated WebP, and AVI (re-encoded as lossless DIB frames).  The
    remaining bitstream (lossy-VP8 webp — no range coder in this
    container) keeps the labeled stub: geometry is still computed from
    real/fake decoded dims and the payload is a deterministic
    content-hash sized to the new geometry so downstream
    byte-accounting stays exercised."""

    anim_codecs = (
        (gif.decode_gif, gif.encode_gif, gif.GifError),
        # decode_apng raises plain PngError on malformed CONTAINER bytes
        # (ApngError only for APNG-layer faults) — catch the base class
        (apng.decode_apng, apng.encode_apng, png.PngError),
        (webp.webp_frames, webp.encode_webp_anim, webp.WebpError),
        (avi.decode_avi, lambda fr: avi.encode_avi(fr, codec="rgb"),
         avi.AviError),
    )
    codecs = (
        (png.decode_png, png.encode_png, png.PngError),
        (bitmaps.decode_bmp, bitmaps.encode_bmp, bitmaps.BitmapError),
        (bitmaps.decode_pnm, bitmaps.encode_pnm, bitmaps.BitmapError),
        (jpeg.decode_jpeg, jpeg.encode_jpeg, jpeg.JpegError),
        (webp.decode_webp, webp.encode_webp, webp.WebpError),
    )

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, ref, fmt, c in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["fmt"], pdf["content"]
            ):
                raw = bytes(c) if c is not None else b""
                payload = None
                for decode, encode, err in anim_codecs:
                    try:
                        frames = decode(raw)
                        h, w = frames.shape[1:3]
                        scale = min(1.0, max_side / max(w, h, 1))
                        nw = max(int(w * scale), 1)
                        nh = max(int(h * scale), 1)
                        # encode can also refuse (e.g. a legal GIF whose
                        # frames UNION >256 colors) — fall through to
                        # the stills/stub path, never fail the task
                        payload = encode(np.stack(
                            [png.resize_nearest(f, nw, nh) for f in frames]
                        ))
                        break
                    except err:
                        continue
                if payload is None:
                    for decode, encode, err in codecs:
                        try:
                            px = decode(raw)
                        except err:
                            continue
                        h, w = px.shape[:2]
                        scale = min(1.0, max_side / max(w, h, 1))
                        nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                        payload = encode(png.resize_nearest(px, nw, nh))
                        break
                if payload is None:
                    w, h, _ch, _ok = _decode_one(raw)
                    scale = min(1.0, max_side / max(w, h, 1))
                    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
                    payload = (hashlib.sha256(raw).digest() * (
                        (nw * nh) // 32 + 1))[: nw * nh]
                rows.append((doc_id, ref, fmt, nw, nh, scale, payload))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "fmt", "width", "height",
                         "scale", "content"],
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def frame_sample_offsets(n_bytes: F.Column, n_frames: int = 4) -> F.Column:
    """Video frame-sampling plumbing (STUB decode): deterministic evenly
    spaced byte offsets as native expressions — the real sampler would
    seek these offsets inside the codec UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: (n_bytes * i / n_frames).cast("long"),
    )


FRAMES_SCHEMA = (
    "doc_id string, media_ref string, frame_index int, n_frames int, "
    "width int, height int, content binary, ok boolean"
)


def frame_sample_media(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Sample up to ``n_frames`` evenly spaced frames per media item.

    Animated-GIF, APNG, and AVI payloads take the REAL path end to end:
    ``core/gif.py`` / ``core/apng.py`` / ``core/avi.py`` decode every
    frame (GIF: LZW, interlace, transparency, disposal; APNG: fcTL
    regions, dispose/blend ops; AVI: RIFF walk + MJPEG-via-DCT or
    uncompressed DIB), evenly spaced frame indices are selected across
    the animation, and each sampled frame ships out PNG-encoded —
    output ``content`` round-trips through ``core/png.py`` to the exact
    decoded pixels.  ``frame_index``/``n_frames`` carry the sampled
    position and true frame count; animated WebP (VP8X/ANIM/ANMF with
    VP8L payloads) composites real frames via ``core/webp.py`` and
    decodable single-frame stills (PNG/BMP/PPM/JPEG/lossless-WebP)
    yield one real-pixel row.

    Undecodable formats (lossy-VP8 webp / non-MJPEG video codecs — no
    range-coder entropy decoder in this container) yield exactly ONE
    labeled row: ``ok=false``, geometry 0x0, ``frame_index``/
    ``n_frames`` 0, content NULL — no code path emits fake frame
    bytes."""

    def _webp_any(raw: bytes) -> np.ndarray:
        try:  # animated first: VP8X+ANIM+ANMF composited frames
            return webp.webp_frames(raw)
        except webp.WebpError:
            return webp.decode_webp(raw)[None]  # lossless still

    def _still(decode):  # decodable stills are 1-frame animations
        return lambda raw: decode(raw)[None]

    def run(batches):
        for pdf in batches:
            rows = []
            for doc_id, ref, c in zip(
                pdf["doc_id"], pdf["media_ref"], pdf["content"]
            ):
                raw = bytes(c) if c is not None else b""
                frames = None
                for decode, err in (
                    (gif.decode_gif, gif.GifError),
                    (apng.decode_apng, png.PngError),  # base class: see resize note
                    (avi.decode_avi, avi.AviError),
                    (_webp_any, webp.WebpError),
                    (_still(png.decode_png), png.PngError),
                    (_still(bitmaps.decode_bmp), bitmaps.BitmapError),
                    (_still(bitmaps.decode_pnm), bitmaps.BitmapError),
                    (_still(jpeg.decode_jpeg), jpeg.JpegError),
                ):
                    try:
                        frames = decode(raw)
                        break
                    except err:
                        continue
                if frames is not None:
                    total, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
                    k = min(n_frames, total)
                    picks = sorted(
                        {round(i * (total - 1) / max(k - 1, 1)) for i in range(k)}
                    )
                    for fi in picks:
                        rows.append(
                            (doc_id, ref, int(fi), total, w, h,
                             png.encode_png(frames[fi]), True)
                        )
                else:
                    rows.append((doc_id, ref, 0, 0, 0, 0, None, False))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "media_ref", "frame_index", "n_frames",
                         "width", "height", "content", "ok"],
            )

    return media.mapInPandas(run, schema=FRAMES_SCHEMA)
