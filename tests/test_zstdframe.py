"""From-spec zstd frame codec (streaming/zstdframe.py, RFC 8878).

Embedded vectors were produced by a real ``zstd`` CLI (v1.5.x) and are
decoded here without it; when a CLI exists in the environment the sweep
tests additionally cross-validate both directions against it.
"""

from __future__ import annotations

import os
import random
import shutil
import subprocess

import pytest

from go_pq_cdc_kafka_spark.streaming.zstdframe import (
    xxh64,
    zstd_compress,
    zstd_decompress,
)

ZSTD_CLI = shutil.which("zstd") or (
    "/root/miniconda/bin/zstd"
    if os.path.exists("/root/miniconda/bin/zstd")
    else None
)


def test_xxh64_known_vectors():
    # public reference values for the xxHash64 algorithm, seed 0
    assert xxh64(b"") == 0xEF46DB3751D8E999
    assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc") == 0x44BC2CF5AD770999
    blob = bytes(range(256)) * 5  # covers 32-byte lanes + 8/4/1 tails
    assert xxh64(blob) == xxh64(bytes(blob))  # determinism
    assert xxh64(blob, seed=1) != xxh64(blob)


# (payload-builder, hex frame from the zstd CLI)
_CLI_VECTORS = [
    # raw-literal block + sequences with repeat offsets (level 19)
    (
        b"the quick brown fox jumps over the lazy dog. " * 40,
        "28b52ffd0468b50100d40274686520717569636b2062726f776e20666f78206a"
        "756d7073206f76657220746865206c617a7920646f672e200100c516feaa0c34"
        "877d7f",
    ),
    # RLE literals/sequences
    (b"\x07" * 5000, "28b52ffd04584d0000100707010083d3032c757d2ab7"),
    # multiple sequences, repeat-offset cycling
    (
        b"abcabcabcdefdefdefXYZ" * 200,
        "28b52ffd0468a500004861626364656658595a0340035080b303ece002a2ded0"
        "6b",
    ),
]


def test_embedded_cli_vectors_decode():
    for payload, hexframe in _CLI_VECTORS:
        assert zstd_decompress(bytes.fromhex(hexframe)) == payload


def test_raw_block_frames_roundtrip():
    for payload in (b"", b"x", b"hello zstd " * 100, os.urandom(300_000)):
        frame = zstd_compress(payload)
        assert zstd_decompress(frame) == payload
        # no-checksum form too
        assert zstd_decompress(zstd_compress(payload, checksum=False)) == payload


def test_checksum_mismatch_rejected():
    frame = bytearray(zstd_compress(b"payload bytes"))
    frame[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum"):
        zstd_decompress(bytes(frame))


def test_multi_frame_concatenation():
    frames = zstd_compress(b"frame-one ") + zstd_compress(b"frame-two")
    assert zstd_decompress(frames) == b"frame-one frame-two"


def test_skippable_frame_is_skipped():
    import struct

    skip = struct.pack("<II", 0x184D2A50, 4) + b"meta"
    assert zstd_decompress(skip + zstd_compress(b"data")) == b"data"


def test_bad_magic_rejected():
    with pytest.raises(ValueError, match="magic"):
        zstd_decompress(b"\x00\x00\x00\x00rest")


@pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI in environment")
def test_cli_decodes_our_frames():
    for payload in (b"", b"abc", b"spark " * 5000, os.urandom(200_000)):
        out = subprocess.run(
            [ZSTD_CLI, "-d", "-c"], input=zstd_compress(payload), capture_output=True
        )
        assert out.returncode == 0, out.stderr[:200]
        assert out.stdout == payload


@pytest.mark.skipif(ZSTD_CLI is None, reason="no zstd CLI in environment")
def test_we_decode_cli_frames_across_levels():
    random.seed(7)
    words = [
        bytes(random.choices(b"abcdefgh ", k=random.randint(2, 9)))
        for _ in range(50)
    ]
    cases = [
        b"",
        b"a",
        b"ab" * 4000,
        bytes(random.randrange(256) for _ in range(100)),
        b"".join(random.choice(words) for _ in range(5000)),
        b"\x00" * 100_000,
        os.urandom(300_000),  # incompressible, multi-block
        b"lorem ipsum dolor sit amet. " * 10_000,  # >128 KiB window reuse
        bytes(random.choices(b"aaaaabbbbcccdde", k=3000)),  # huffman literals
    ]
    for lvl in ("-1", "-3", "-19"):
        for payload in cases:
            comp = subprocess.run(
                [ZSTD_CLI, lvl, "-c"], input=payload, capture_output=True
            ).stdout
            assert zstd_decompress(comp) == payload, (lvl, len(payload))
    # long-window and no-checksum frame forms
    big = b"".join(random.choice(words) for _ in range(100_000))
    for args in (["-3", "--no-check"], ["-19", "--long=20"]):
        comp = subprocess.run(
            [ZSTD_CLI, *args, "-c"], input=big, capture_output=True
        ).stdout
        assert zstd_decompress(comp) == big, args


def test_avro_zstandard_codec_roundtrip(tmp_path):
    from go_pq_cdc_kafka_spark.sources.avro import read_ocf, write_ocf

    schema = {
        "type": "record",
        "name": "Row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
        ],
    }
    rows = [{"id": i, "name": f"row-{i}" * 10} for i in range(500)]
    path = str(tmp_path / "z.avro")
    write_ocf(path, schema, iter(rows), "zstandard", 128)
    got = list(read_ocf(open(path, "rb").read()))
    assert got == rows
