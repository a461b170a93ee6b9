"""From-spec LZ4 (block + frame + xxHash32) used by the Kafka wire path's
compression.type=lz4 (reference surface: config/config.go:59-64)."""

import os
import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from go_pq_cdc_kafka_spark.streaming.lz4frame import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_spec_vectors():
    # published reference vectors (xxHash spec / reference impl)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    assert xxh32(b"", seed=1) != xxh32(b"")
    # >=16-byte path exercises the 4-lane accumulator
    assert xxh32(b"0123456789abcdefghijklmnop") == xxh32(
        b"0123456789abcdefghijklmnop", seed=0
    )


def test_block_roundtrip_shapes():
    random.seed(11)
    cases = [
        b"", b"x", b"abcd", b"hello world " * 1000,
        bytes(range(256)) * 100, b"a" * 100000,
        os.urandom(4096),                      # incompressible
        bytes(random.choices(b"ab", k=65536)),  # long matches, overlaps
    ]
    for d in cases:
        assert lz4_block_decompress(lz4_block_compress(d)) == d


def test_frame_roundtrip_and_multiblock():
    big = b"the quick brown fox jumps " * 250000  # ~6.5 MB: >1 block
    framed = lz4_frame_compress(big)
    assert framed[:4] == struct.pack("<I", 0x184D2204)
    assert len(framed) < len(big) // 10
    assert lz4_frame_decompress(framed) == big
    # incompressible content stores raw blocks (high bit set), still valid
    rnd = os.urandom(100000)
    assert lz4_frame_decompress(lz4_frame_compress(rnd)) == rnd


def test_frame_rejects_corruption():
    framed = bytearray(lz4_frame_compress(b"payload " * 100))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00" + bytes(framed[4:]))
    bad = bytearray(framed)
    bad[6] ^= 0xFF  # header checksum byte
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        lz4_frame_decompress(bytes(framed[:-3]))


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=8192))
def test_block_roundtrip_property(data):
    assert lz4_block_decompress(lz4_block_compress(data)) == data


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=8192))
def test_frame_roundtrip_property(data):
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data
