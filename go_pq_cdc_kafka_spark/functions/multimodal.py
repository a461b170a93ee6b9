"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

Decoders are REAL for every format expressible with stdlib+numpy from the
public specs: BMP (24/32-bit uncompressed), PPM/PGM binary, PCM WAV,
**PNG** (non-interlaced 8-bit gray/RGB/palette/gray-alpha/RGBA — chunk
CRC-32 verification, stdlib-zlib inflate, all five scanline filters), and
**baseline JPEG** (ITU T.81: Huffman entropy decode, dequant+IDCT,
4:2:0/4:2:2 upsampling, restart markers — functions/jpeg.py, encoder
included) — ``decode_image``/``decode_audio`` parse the actual bytes,
``encode_bmp``/``encode_png``/``encode_jpeg``/``encode_wav`` synthesize
them, ``resize_nearest`` resamples with pure integer index math, and
``image_stats``/``audio_stats`` run the decoders distributed. Codecs
needing an external library (progressive JPEG, mp3/mp4, 16-bit/interlaced
PNG) raise NotImplementedError at the documented integration point —
never a silent wrong answer. The
remaining md5-based stages (``extract_features``, ``sample_frames``,
``resize_images``) stay codec-agnostic by design: they exercise the
payload plumbing for formats the environment cannot decode.

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
# decoders — REAL for the uncompressed formats (pure stdlib + numpy, from
# the public format specs); compressed codecs remain documented
# integration points (no PIL/opencv/ffmpeg in this environment)
# ---------------------------------------------------------------------------


def decode_image(payload: bytes):
    """Decode an image payload to an RGB ``numpy`` array (H, W, 3).

    Real decoders, implemented from the public specs with stdlib+numpy:

    - **BMP** (Windows ``BITMAPINFOHEADER``, uncompressed 24/32-bit,
      bottom-up or top-down row order, 4-byte row padding, BGR(A) order)
    - **PPM** binary (``P6``, maxval 255)
    - **PGM** binary (``P5``, maxval 255 — replicated to 3 channels)
    - **PNG** (non-interlaced 8-bit; see ``_decode_png``)
    - **baseline JPEG** (ITU T.81; see functions/jpeg.py)

    Formats needing an external codec (webp, progressive JPEG, ...) raise
    NotImplementedError/ValueError with the integration point documented —
    never a silent wrong answer.
    """
    import numpy as np

    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return _decode_pnm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from go_pq_cdc_kafka_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from go_pq_cdc_kafka_spark.functions.gif import decode_gif

        return decode_gif(payload)
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        from go_pq_cdc_kafka_spark.functions.tiff import decode_tiff

        return decode_tiff(payload)
    raise ValueError(
        "unrecognized image payload "
        "(supported: BMP, PPM, PGM, PNG, JPEG, GIF, TIFF)"
    )


def _decode_bmp(payload: bytes):
    import numpy as np
    import struct as _struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    pixel_off = _struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = _struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    planes, bpp = _struct.unpack_from("<HH", payload, 26)
    compression = _struct.unpack_from("<I", payload, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    ch = bpp // 8
    stride = ((width * ch) + 3) & ~3  # rows pad to 4 bytes
    need = pixel_off + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=pixel_off
    ).reshape(height, stride)[:, : width * ch].reshape(height, width, ch)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, 2::-1].copy()  # BGR(A) -> RGB, alpha dropped


def _decode_pnm(payload: bytes):
    import numpy as np

    # header: magic, whitespace/comments, width, height, maxval, ONE ws
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only maxval=255 PNM supported")
    ch = 3 if payload[:2] == b"P6" else 1
    need = width * height * ch
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    arr = arr.reshape(height, width, ch)
    return np.repeat(arr, 3, axis=2) if ch == 1 else arr.copy()


# --- PNG, implemented from the public spec (RFC 2083 / W3C PNG):
# chunk framing with CRC-32 verification, zlib (stdlib) inflate of the
# IDAT stream, and the five scanline filters (None/Sub/Up/Average/Paeth).
# Bit depths 8 and 16 (16-bit reduced to 8 via the high byte), color types
# 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), both
# non-interlaced and Adam7-interlaced streams (seven independently
# filtered sub-images scattered by the spec's pass layout). 1/2/4-bit
# images raise loudly — never a silent wrong answer.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunks(payload: bytes):
    """Yield (type, data) for each chunk, verifying each CRC-32 (over the
    type + data bytes, per spec)."""
    import struct as _struct
    import zlib as _zlib

    pos = 8
    while pos + 8 <= len(payload):
        length, ctype = _struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(payload):
            raise ValueError("truncated PNG chunk")
        crc = _struct.unpack_from(">I", payload, pos + 8 + length)[0]
        if _zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG missing IEND chunk")


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor, verbatim from the spec's reference function."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw, offset, width, height, bpp):
    """Unfilter one (sub)image of ``height`` scanlines of ``width*bpp``
    bytes each, starting at ``offset`` in the decompressed stream. Returns
    (rows uint8 (height, width*bpp), bytes consumed). Up/None vectorize
    fully; Sub/Average/Paeth carry a prior-pixel dependency, walked
    pixel-wise with the pixel byte-vector as the unit (int math mod 256,
    per spec)."""
    import numpy as np

    stride = width * bpp
    need = (stride + 1) * height
    if offset + need > len(raw):
        raise ValueError("PNG: IDAT length does not match dimensions")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            recon = line
        elif ftype == 2:  # Up
            recon = (line + prev) & 0xFF
        else:
            recon = np.zeros(stride, dtype=np.int32)
            for x in range(0, stride, bpp):
                left = recon[x - bpp : x] if x else np.zeros(bpp, np.int32)
                up = prev[x : x + bpp]
                upleft = prev[x - bpp : x] if x else np.zeros(bpp, np.int32)
                seg = line[x : x + bpp]
                if ftype == 1:  # Sub
                    recon[x : x + bpp] = (seg + left) & 0xFF
                elif ftype == 3:  # Average
                    recon[x : x + bpp] = (seg + (left + up) // 2) & 0xFF
                elif ftype == 4:  # Paeth
                    recon[x : x + bpp] = (
                        seg
                        + np.array(
                            [
                                _paeth(int(a), int(b), int(c))
                                for a, b, c in zip(left, up, upleft)
                            ],
                            dtype=np.int32,
                        )
                    ) & 0xFF
                else:
                    raise ValueError(f"PNG: invalid filter type {ftype}")
        out[y] = recon.astype(np.uint8)
    return out, need


#: Adam7 pass layout: (x_start, x_step, y_start, y_step), per the spec
_ADAM7 = (
    (0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
    (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2),
)


def _decode_png(payload: bytes):
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    ihdr = None
    plte = None
    idat = bytearray()
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            ihdr = _struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if depth not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PNG supported (depth={depth})"
        )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"PNG: invalid color type {color_type}")
    if color_type == 3 and depth != 8:
        raise NotImplementedError("paletted PNG requires depth 8 here")

    raw = _zlib.decompress(bytes(idat))
    bpp = channels * (depth // 8)
    flat = np.zeros((height, width * bpp), dtype=np.uint8)
    if interlace == 0:
        rows, used = _png_unfilter(raw, 0, width, height, bpp)
        if used != len(raw):
            raise ValueError("PNG: IDAT length does not match dimensions")
        flat = rows
    elif interlace == 1:  # Adam7: seven independently-filtered sub-images
        offset = 0
        for x0, xs, y0, ys in _ADAM7:
            pw = (width - x0 + xs - 1) // xs
            ph = (height - y0 + ys - 1) // ys
            if pw <= 0 or ph <= 0:
                continue  # empty pass on small images
            rows, used = _png_unfilter(raw, offset, pw, ph, bpp)
            offset += used
            sub = rows.reshape(ph, pw, bpp)
            flat.reshape(height, width, bpp)[y0::ys, x0::xs] = sub
        if offset != len(raw):
            raise ValueError("PNG: IDAT length does not match pass layout")
    else:
        raise ValueError(f"PNG: invalid interlace method {interlace}")

    if depth == 16:
        # big-endian 16-bit samples reduced to 8-bit (high byte, the
        # spec-sanctioned approximation of v*255/65535)
        px16 = flat.reshape(height, width, channels, 2)
        px = px16[:, :, :, 0].copy()
    else:
        px = flat.reshape(height, width, channels)
    if color_type == 2:
        return px.copy()
    if color_type == 6:
        return px[:, :, :3].copy()  # alpha dropped, matching BMP-32 handling
    if color_type == 0:
        return np.repeat(px, 3, axis=2)
    if color_type == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # color_type == 3: palette indices -> PLTE triples
    if plte is None or len(plte) % 3:
        raise ValueError("paletted PNG missing/invalid PLTE")
    table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = px[:, :, 0]
    if int(idx.max(initial=0)) >= table.shape[0]:
        raise ValueError("PNG palette index out of range")
    return table[idx]


def _png_filter_line(ftype: int, line, left_shifted, prev, prev_shifted):
    """Apply (encode-side) scanline filter ``ftype`` — the inverse of the
    decoder's reconstruction, used by encode_png to produce fixtures that
    exercise every filter path."""
    import numpy as np

    if ftype == 0:
        return line.copy()
    if ftype == 1:
        return (line - left_shifted) & 0xFF
    if ftype == 2:
        return (line - prev) & 0xFF
    if ftype == 3:
        return (line - (left_shifted + prev) // 2) & 0xFF
    pred = np.array(
        [
            _paeth(int(a), int(b), int(c))
            for a, b, c in zip(left_shifted, prev, prev_shifted)
        ],
        dtype=np.int32,
    )
    return (line - pred) & 0xFF


def encode_png(arr, filter_type: int = 0, interlace: bool = False) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as an 8-bit truecolor PNG
    (from the public spec; zlib + CRC-32 via stdlib). ``filter_type``
    applies that scanline filter to every row — fixture synthesis uses
    1/2/3/4 to prove the decoder's unfilter paths against an independent
    oracle, 0 for plain output. ``interlace`` writes the Adam7 pass
    layout (each pass filtered independently, per spec)."""
    import struct as _struct
    import zlib as _zlib

    import numpy as np

    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) RGB")
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError("filter_type must be 0..4")
    h, w, _ = arr.shape
    bpp = 3

    def filter_image(img) -> bytearray:
        ph, pw = img.shape[:2]
        stride = pw * bpp
        flat = img.reshape(ph, stride).astype(np.int32)
        body = bytearray()
        for y in range(ph):
            line = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, np.int32)
            left = np.concatenate([np.zeros(bpp, np.int32), line[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]])
            body.append(filter_type)
            body.extend(
                _png_filter_line(filter_type, line, left, prev, upleft)
                .astype(np.uint8)
                .tobytes()
            )
        return body

    body = bytearray()
    if interlace:
        for x0, xs, y0, ys in _ADAM7:
            sub = arr[y0::ys, x0::xs]
            if sub.shape[0] and sub.shape[1]:
                body += filter_image(sub)
    else:
        body = filter_image(arr)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + ctype
            + data
            + _struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(bytes(body), 6))
        + chunk(b"IEND", b"")
    )


def encode_bmp(arr) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as 24-bit bottom-up BMP —
    fixture synthesis and sink-side media writes without any codec lib."""
    import numpy as np
    import struct as _struct

    arr = np.asarray(arr, dtype=np.uint8)
    h, w, ch = arr.shape
    if ch != 3:
        raise ValueError("encode_bmp expects (H, W, 3) RGB")
    stride = ((w * 3) + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = _struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


def resize_nearest(arr, out_w: int, out_h: int):
    """Deterministic nearest-neighbor resample (floor index mapping):
    ``src_row = (dst_row * in_h) // out_h`` — pure integer arithmetic, so
    results are identical everywhere (no float rounding mode in sight)."""
    import numpy as np

    in_h, in_w = arr.shape[:2]
    rows = (np.arange(out_h) * in_h) // out_h
    cols = (np.arange(out_w) * in_w) // out_w
    return arr[rows][:, cols]


def _g711_mulaw_table():
    """256-entry μ-law → 16-bit linear expansion (ITU-T G.711, the
    standard table audioop/sox produce)."""
    import numpy as np

    out = np.zeros(256, np.int32)
    for code in range(256):
        u = ~code & 0xFF
        exp = (u >> 4) & 7
        mant = u & 0xF
        mag = (((mant << 3) + 0x84) << exp) - 0x84
        out[code] = -mag if u & 0x80 else mag
    return out


def _g711_alaw_table():
    """256-entry A-law → 16-bit linear expansion (ITU-T G.711)."""
    import numpy as np

    out = np.zeros(256, np.int32)
    for code in range(256):
        a = code ^ 0x55
        exp = (a >> 4) & 7
        mant = a & 0xF
        if exp:
            mag = ((mant << 4) + 0x108) << (exp - 1)
        else:
            mag = (mant << 4) + 8
        out[code] = mag if a & 0x80 else -mag
    return out


def decode_audio(payload: bytes):
    """Decode a WAV payload → (samples int32 ndarray [n, channels],
    sample_rate). Real decoders: PCM 8/16/32-bit via the stdlib ``wave``
    module, plus ITU-T G.711 μ-law (format tag 7) and A-law (tag 6)
    expanded through the spec's segment tables (telephony corpora ship as
    G.711 WAV). Compressed audio (mp3/ogg/flac) raises
    NotImplementedError — the codec-library integration point."""
    import io as _io
    import struct as _struct
    import wave as _wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            "only RIFF/WAVE payloads decode here; compressed audio needs a "
            "codec library — plug it in at this integration point"
        )
    try:
        with _wave.open(_io.BytesIO(payload), "rb") as wf:
            n, ch, sw = wf.getnframes(), wf.getnchannels(), wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(n)
    except _wave.Error:
        # non-PCM: walk the RIFF chunks ourselves (fmt tag 6 = A-law,
        # 7 = μ-law; anything else stays loud)
        fmt = None
        data = None
        pos = 12
        while pos + 8 <= len(payload):
            cid, ln = payload[pos : pos + 4], _struct.unpack_from(
                "<I", payload, pos + 4
            )[0]
            body = payload[pos + 8 : pos + 8 + ln]
            if cid == b"fmt ":
                fmt = _struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + ln + (ln & 1)  # chunks pad to even
        if fmt is None or data is None:
            raise ValueError("WAV: missing fmt/data chunk")
        tag, ch, rate = fmt[0], fmt[1], fmt[2]
        if tag == 7:
            table = _g711_mulaw_table()
        elif tag == 6:
            table = _g711_alaw_table()
        else:
            raise NotImplementedError(
                f"WAV format tag {tag} needs a codec library (supported: "
                "PCM, G.711 A-law/mu-law)"
            )
        codes = np.frombuffer(data, dtype=np.uint8)
        samples = table[codes].reshape(-1, ch).astype(np.int64)
        return samples, rate
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported PCM sample width {sw}")
    samples = np.frombuffer(raw, dtype=dtype).reshape(-1, ch).astype(np.int64)
    if sw == 1:  # 8-bit WAV is unsigned; center it
        samples = samples - 128
    return samples, rate


def encode_wav(samples, sample_rate: int) -> bytes:
    """Encode an (n, channels) int16 array as PCM WAV (stdlib wave)."""
    import io as _io
    import wave as _wave

    import numpy as np

    arr = np.asarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    buf = _io.BytesIO()
    with _wave.open(buf, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(arr.tobytes())
    return buf.getvalue()


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


IMAGE_STATS_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "sum_r long, sum_g long, sum_b long"
)


def image_stats(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL decode → per-channel pixel sums (integer-exact, so an oracle
    that knows the generating formula can reproduce them bit-for-bit).
    Embarrassingly parallel mapInPandas; payloads never leave the task."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, sr, sg, sb = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                arr = decode_image(bytes(payload))
                ids.append(int(doc_id))
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                chs.append(arr.shape[2])
                sums = arr.astype("int64").sum(axis=(0, 1))
                sr.append(int(sums[0]))
                sg.append(int(sums[1]))
                sb.append(int(sums[2]))
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "channels": chs,
                 "sum_r": sr, "sum_g": sg, "sum_b": sb}
            )

    return df.mapInPandas(gen, schema=IMAGE_STATS_SCHEMA)


AUDIO_STATS_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, channels int, "
    "duration_ms long, sum_abs long, sum_sq long"
)


def audio_stats(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL WAV decode → integer signal statistics (|x| and x² sums keep
    the oracle exact; RMS/loudness are one sqrt away for consumers)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col].to_numpy(), pdf[payload_col]):
                samples, rate = decode_audio(bytes(payload))
                n = samples.shape[0]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "sample_rate": rate,
                        "n_samples": n,
                        "channels": samples.shape[1],
                        "duration_ms": (n * 1000) // rate if rate else 0,
                        "sum_abs": int(abs(samples).sum()),
                        "sum_sq": int((samples * samples).sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "sample_rate", "n_samples", "channels",
                "duration_ms", "sum_abs", "sum_sq"])

    return df.mapInPandas(gen, schema=AUDIO_STATS_SCHEMA)


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
