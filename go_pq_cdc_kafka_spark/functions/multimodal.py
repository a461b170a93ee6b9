"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The decode step itself is STUBBED (no image/audio libraries in this
environment — ``decode_image``/``decode_audio`` raise NotImplementedError
with the integration point documented); everything Spark-side is real and
tested: the media schema, payload plumbing, batch shapes, deterministic
feature extraction (hash/length — verifiable against a SQL oracle), resize /
frame-sample parameter plumbing with deterministic fake outputs.

Scale notes: payloads stay binary end-to-end (no base64 inflation), batches
stream through Arrow (``mapInPandas`` never materializes a partition), and
feature extraction is embarrassingly parallel — no shuffle at all.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), True),  # image|audio|video
        StructField("format", StringType(), True),      # png|jpeg|wav|mp4|...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("payload", BinaryType(), True),
        StructField("meta", MEDIA_META_SCHEMA, True),
    ]
)


def media_struct(
    payload: Column,
    media_type: str = "image",
    fmt: str = "bin",
    width: Column | None = None,
    height: Column | None = None,
    duration_ms: Column | None = None,
) -> Column:
    null_i = F.lit(None).cast("int")
    return F.struct(
        payload.cast("binary").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            (width if width is not None else null_i).cast("int").alias("width"),
            (height if height is not None else null_i).cast("int").alias("height"),
            (duration_ms if duration_ms is not None else null_i).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode stubs — the library integration points
# ---------------------------------------------------------------------------

def decode_image(payload: bytes):  # pragma: no cover - documented stub
    """Integration point for a real image decoder (PIL/opencv). Not
    available in this environment."""
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. PIL); plug it in "
        "here — the surrounding Spark plumbing (schema, batching, UDF "
        "signatures) is decoder-agnostic"
    )


def decode_audio(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError("audio decoding requires an audio library")


def _fake_pixels(payload: bytes, n: int = 8) -> list[int]:
    """Deterministic decode stand-in: first n bytes of md5(payload) — lets
    every downstream stage (resize, feature, frame-sample) run and be
    asserted without a codec."""
    return list(hashlib.md5(payload).digest()[:n])


# ---------------------------------------------------------------------------
# mapInPandas stages
# ---------------------------------------------------------------------------

FEATURE_SCHEMA = "doc_id long, payload_md5 string, payload_bytes long"


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (md5 + size —
    deterministic, SQL-oracle-checkable). Swap the body for a real
    decoder+featurizer; the plumbing stays identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "payload_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, pixels array<int>"


def resize_images(
    df: DataFrame, width: int, height: int, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Resize plumbing: batch in, (doc, w, h, pixels) out. Pixels come from
    the deterministic fake decoder; a real implementation replaces
    ``_fake_pixels`` with decode+resample."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "pixels": pdf[payload_col].map(
                        lambda b: _fake_pixels(bytes(b), width * height)
                    ),
                }
            )

    return df.mapInPandas(gen, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no int, frame_md5 string"


def sample_frames(
    df: DataFrame, every_n_bytes: int = 64, max_frames: int = 4,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling plumbing (1→N rows per video payload): deterministic
    byte-window 'frames' stand in for real keyframe extraction."""

    # iterate zipped column arrays, never pdf.iterrows(): iterrows builds a
    # Series per row (~100× slower) and the pattern would be copied verbatim
    # when a real keyframe decoder replaces the md5 stand-in
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            frame_nos: list[int] = []
            md5s: list[str] = []
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                payload = bytes(payload)
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    window = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(int(doc_id))
                    frame_nos.append(i)
                    md5s.append(hashlib.md5(window).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": frame_nos, "frame_md5": md5s}
            )

    return df.mapInPandas(gen, schema=FRAME_SCHEMA)
