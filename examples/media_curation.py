#!/usr/bin/env python
"""An end-to-end MULTIMODAL curation pipeline on this engine.

The text recipe (examples/curation.py) has a media twin: a mixed bag of
image and audio payloads arrives in whatever formats the crawl produced —
BMP, PNG (any scanline filter), baseline JPEG, GIF, TIFF (PackBits or
LZW+predictor), PCM and G.711 WAV — and one job runs the standard media
recipe with the from-spec codecs in `functions/`:

1. format-dispatched decode + per-payload stats (Arrow-batched
   ``mapInPandas`` — one task per batch of payloads, map-only),
2. quality gates on the DECODED signal (resolution floor for images,
   duration floor + non-silence for audio),
3. exact dedup on decoded CONTENT (pixel/sample digests, so the same
   image saved as BMP by one crawler and PNG by another still collapses),
4. thumbnailing via the integer-exact resampler.

Every payload stays a binary column end-to-end; nothing touches the
driver. Run: python examples/media_curation.py
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from go_pq_cdc_kafka_spark.functions import multimodal as MM
from go_pq_cdc_kafka_spark.functions.gif import encode_gif
from go_pq_cdc_kafka_spark.functions.jpeg import encode_jpeg
from go_pq_cdc_kafka_spark.functions.tiff import encode_tiff
from go_pq_cdc_kafka_spark.session import get_spark


def _synth_corpus(spark, n_items: int = 60):
    """A mixed-format media corpus, synthesized deterministically: item i
    carries pattern family i//6 in format family i%6 — so each pattern
    exists in several formats (cross-format duplicates for stage 3), and
    every codec path decodes something."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                fam, fmt = i // 6, i % 6
                r = np.arange(16).reshape(16, 1, 1)
                c = np.arange(24).reshape(1, 24, 1)
                k = np.arange(3).reshape(1, 1, 3)
                arr = ((fam * 29 + r * 5 + c * 3 + k * 7) % 256).astype(np.uint8)
                if fmt == 0:
                    payload, mtype = MM.encode_bmp(arr), "image"
                elif fmt == 1:
                    payload, mtype = MM.encode_png(arr, filter_type=fam % 5), "image"
                elif fmt == 2:
                    # solid-gray JPEG decodes losslessly (DC-only blocks)
                    g = (fam * 29) % 256
                    solid = np.full((16, 24, 3), g, np.uint8)
                    payload = encode_jpeg(
                        solid, grayscale=True,
                        luma_qtable=np.full((8, 8), 8, np.int32),
                    )
                    mtype = "image"
                elif fmt == 3:
                    pal = np.stack(
                        [(np.arange(8) * 31 + fam) % 256] * 3, axis=1
                    ).astype(np.uint8)
                    idx = ((r[:, :, 0] + c[0, :, 0].reshape(1, 24)) % 8).astype(np.uint8)
                    payload, mtype = encode_gif(idx, pal), "image"
                elif fmt == 4:
                    payload = encode_tiff(arr, lzw=True, predictor=True)
                    mtype = "image"
                else:
                    t = np.arange(1200, dtype=np.int64)
                    samples = ((fam * 17 + t * 11) % 199 - 99).astype(np.int16)
                    payload, mtype = MM.encode_wav(samples, 8000), "audio"
                rows.append({"media_id": i, "media_type": mtype,
                             "payload": payload})
            yield pd.DataFrame(rows, columns=["media_id", "media_type", "payload"])

    return spark.range(n_items).withColumnRenamed("id", "id").mapInPandas(
        gen, "media_id long, media_type string, payload binary"
    )


STATS_SCHEMA = (
    "media_id long, media_type string, width int, height int, "
    "n_samples long, duration_ms long, mean_level double, content_md5 string"
)


def decode_stats(df):
    """Stage 1+3 prep: decode every payload by magic-byte dispatch, emit
    signal stats and a digest of the DECODED content (format-independent)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(payload)
                if mtype == "image":
                    arr = MM.decode_image(payload)
                    rows.append({
                        "media_id": int(mid), "media_type": mtype,
                        "width": arr.shape[1], "height": arr.shape[0],
                        "n_samples": None, "duration_ms": None,
                        "mean_level": float(arr.mean()),
                        "content_md5": hashlib.md5(
                            arr.tobytes() + bytes(arr.shape)
                        ).hexdigest(),
                    })
                else:
                    samples, rate = MM.decode_audio(payload)
                    rows.append({
                        "media_id": int(mid), "media_type": mtype,
                        "width": None, "height": None,
                        "n_samples": int(samples.shape[0]),
                        "duration_ms": int(samples.shape[0] * 1000 // rate),
                        "mean_level": float(np.abs(samples).mean()),
                        "content_md5": hashlib.md5(
                            samples.tobytes() + bytes([samples.shape[1]])
                        ).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "media_type", "width", "height", "n_samples",
                "duration_ms", "mean_level", "content_md5"])

    return df.mapInPandas(gen, STATS_SCHEMA)


def main(spark=None) -> dict:
    spark = spark or get_spark(app_name="example-media-curation")
    corpus = _synth_corpus(spark)
    stats = decode_stats(corpus)
    stages = {"input": stats.count()}

    # 2. quality gates on the decoded signal
    kept = stats.filter(
        (
            (F.col("media_type") == "image")
            & (F.col("width") >= 8) & (F.col("height") >= 8)
        )
        | (
            (F.col("media_type") == "audio")
            & (F.col("duration_ms") >= 100) & (F.col("mean_level") > 0.0)
        )
    )
    stages["after_quality"] = kept.count()

    # 3. exact dedup on decoded content: one survivor per content digest
    # (the same pattern family encoded as BMP and PNG collapses; lossy
    # JPEG families stay distinct — as they should)
    from pyspark.sql import Window

    w = Window.partitionBy("content_md5").orderBy("media_id")
    survivors = (
        kept.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    stages["after_dedup"] = survivors.count()

    # 4. thumbnail the surviving images (integer-exact resample)
    thumbs = MM.resize_images(
        corpus.join(
            survivors.filter(F.col("media_type") == "image")
            .select("media_id"),
            "media_id", "left_semi",
        ).withColumnRenamed("media_id", "doc_id"),
        width=8, height=8,
    )
    stages["thumbnails"] = thumbs.count()
    return stages


if __name__ == "__main__":
    print(main())
