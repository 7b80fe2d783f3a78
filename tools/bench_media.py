#!/usr/bin/env python
"""Multimodal operator throughput (items/s per stage, one JSON line).

Generates a deterministic mixed-format media corpus — PNG / BMP / PPM /
baseline JPEG / PROGRESSIVE JPEG / GIF (animated) / animated WebP /
lossless WebP / WAV / adversarial byte soup — materialized to parquet
first (a LocalTableScan would ship every payload inside every task,
CLAUDE.md gotcha), then times the four mapInPandas stages end to end:
``decode_media``, ``media_features``, ``resize_media``,
``frame_sample_media``.  Interleaved best-of-N per stage (same
protocol as bench.py) so one throttle window cannot write the record.

Usage: MEDIA_ITEMS=2000 SPARK_GRAFT_CPUS=32 python tools/bench_media.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_ITEMS = int(os.environ.get("MEDIA_ITEMS", "2000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("MEDIA_PASSES", "2"))


def _payload(kind: str, rng: np.random.Generator) -> bytes:
    from privacy_crawler_parser_tokenizer_spark.core import (
        bitmaps, gif, jpeg, png, wav, webp,
    )

    h, w = int(rng.integers(16, 64)), int(rng.integers(16, 64))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    if kind == "png":
        return png.encode_png(img)
    if kind == "bmp":
        return bitmaps.encode_bmp(img)
    if kind == "ppm":
        return bitmaps.encode_pnm(img)
    if kind == "jpeg":
        return jpeg.encode_jpeg(img, quality=85)
    if kind == "jpeg_prog":
        return jpeg.encode_jpeg_progressive(img, quality=85)
    if kind == "gif_anim":
        pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
        frames = pal[rng.integers(0, 8, size=(3, h // 2, w // 2))]
        return gif.encode_gif(frames.astype(np.uint8))
    if kind == "webp_anim":
        frames = rng.integers(0, 256, size=(2, h // 2, w // 2, 3), dtype=np.uint8)
        return webp.encode_webp_anim(frames)
    if kind == "webp":
        return webp.encode_webp(img, rle=True)
    if kind == "wav":
        t = np.arange(int(rng.integers(400, 1600))) / 8000.0
        pcm = (np.sin(2 * np.pi * 440 * t) * 8000).astype("<i2")[:, None]
        return wav.encode_wav(pcm, 8000)
    return rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()  # soup


KINDS = ["png", "bmp", "ppm", "jpeg", "jpeg_prog", "gif_anim",
         "webp_anim", "webp", "wav", "soup"]


def main() -> None:
    from pyspark.sql import SparkSession

    from privacy_crawler_parser_tokenizer_spark.functions import multimodal as mm

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pcpt-media-bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rng = np.random.default_rng(42)
    rows = []
    for i in range(N_ITEMS):
        kind = KINDS[i % len(KINDS)]
        rows.append((str(i), f"media://{i}", kind,
                     bytearray(_payload(kind, rng))))
    path = os.path.join(tempfile.mkdtemp(prefix="pcpt-media-"), "media.parquet")
    spark.createDataFrame(rows, schema=mm.MEDIA_SCHEMA).coalesce(8) \
        .write.mode("overwrite").parquet(path)
    media = spark.read.parquet(path)

    stages = {
        "decode": lambda: mm.decode_media(media).count(),
        "features": lambda: mm.media_features(media).count(),
        "resize": lambda: mm.resize_media(media, max_side=32).count(),
        "frames": lambda: mm.frame_sample_media(media).count(),
    }
    for fn in stages.values():  # warmup (codegen + python workers)
        fn()
    best = {k: float("inf") for k in stages}
    for _ in range(PASSES):
        for name, fn in stages.items():
            t0 = time.monotonic()
            n = fn()
            best[name] = min(best[name], time.monotonic() - t0)
    ok_frac = (
        mm.decode_media(media).where("ok").count() / N_ITEMS
    )
    print(json.dumps({
        "metric": "media_items_per_sec",
        "items": N_ITEMS,
        "cpus": CPUS,
        "passes": PASSES,
        "ok_fraction": round(ok_frac, 3),
        "stages": {k: {"sec": round(v, 2),
                       "items_per_sec": round(N_ITEMS / v, 1)}
                   for k, v in best.items()},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
