"""From-spec LZ4 for the Kafka wire path (record batch attributes codec 3).

Implemented from the PUBLIC format documents only:

- LZ4 Block Format (lz4.github.io/lz4/lz4_Block_format.html): token with
  4-bit literal-length / match-length nibbles (15 ⇒ 255-extension bytes),
  little-endian u16 match offsets, overlap-legal copies, end-of-block
  rules (last sequence is literals-only; matches must not start within
  the final 12 bytes).
- LZ4 Frame Format v1.6.1 (lz4.github.io/lz4/lz4_Frame_format.html):
  magic 0x184D2204, FLG/BD descriptor + xxh32 header checksum, block
  section with the uncompressed-bit in the size word, EndMark, optional
  content checksum.
- xxHash32 (github.com/Cyan4973/xxHash doc/xxhash_spec.md) for the
  header/content checksums.

Kafka (message format v2) wraps the records section of a batch in a
standard LZ4 frame — this module is what lets the jar-free producer and
consumer speak ``compression.type=lz4`` with real brokers and clients.
Reference surface parity: config/config.go:59-64 lists lz4 among the
producer codecs.
"""

from __future__ import annotations

import struct

# --- xxHash32 (spec constants) ---------------------------------------------

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 per the published spec — used by the LZ4 frame format for
    its header and content checksums."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            lanes = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + lanes[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + lanes[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + lanes[3] * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# --- LZ4 block codec -------------------------------------------------------

_MIN_MATCH = 4
# spec end-of-block rules: the last 5 bytes are always literals, and a
# match must not start within the last 12 bytes
_LAST_LITERALS = 5
_MFLIMIT = 12


def lz4_block_decompress(src: bytes, max_out: int | None = None) -> bytes:
    out = bytearray()
    pos, n = 0, len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += src[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence: literals only, no offset
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        (offset,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        match_len = token & 0xF
        if match_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        match_len += _MIN_MATCH
        if max_out is not None and len(out) + match_len > max_out:
            raise ValueError("lz4: output exceeds declared size")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start : start + match_len]
        else:  # overlapping copy: byte-wise run repetition (spec-legal)
            for _ in range(match_len):
                out.append(out[-offset])
    return bytes(out)


def lz4_block_compress(src: bytes) -> bytes:
    """Greedy 4-byte-prefix hash matcher emitting spec-conforming
    sequences; honors the end-of-block rules so ANY conforming decoder
    (including the reference implementation) accepts the output."""
    n = len(src)
    out = bytearray()

    def emit(lit_start: int, lit_end: int, match_len: int, offset: int):
        lit_len = lit_end - lit_start
        token_lit = 15 if lit_len >= 15 else lit_len
        token_match = 0
        if match_len:
            ml = match_len - _MIN_MATCH
            token_match = 15 if ml >= 15 else ml
        # out.extend, not out += : += rebinds and would make ``out`` local
        out.append((token_lit << 4) | token_match)
        if lit_len >= 15:
            rem = lit_len - 15
            while rem >= 255:
                out.append(255)
                rem -= 255
            out.append(rem)
        out.extend(src[lit_start:lit_end])
        if match_len:
            out.extend(struct.pack("<H", offset))
            ml = match_len - _MIN_MATCH
            if ml >= 15:
                rem = ml - 15
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)

    if n < _MFLIMIT + 1:
        emit(0, n, 0, 0)
        return bytes(out)

    table: dict[bytes, int] = {}
    i, lit_start = 0, 0
    limit = n - _MFLIMIT  # matches must not start past here
    while i <= limit:
        key = src[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF and src[j : j + 4] == key:
            length = 4
            max_len = n - _LAST_LITERALS - i
            while (
                length < max_len and src[j + length] == src[i + length]
            ):
                length += 1
            emit(lit_start, i, length, i - j)
            i += length
            lit_start = i
        else:
            i += 1
    emit(lit_start, n, 0, 0)
    return bytes(out)


# --- LZ4 frame codec -------------------------------------------------------

_MAGIC = 0x184D2204
_BLOCK_MAX = 4 << 20  # BD code 7 (4 MB) — one block per Kafka batch usually


def lz4_frame_compress(data: bytes) -> bytes:
    """Minimal conforming frame: v01, block-independent, no block/content
    checksums, no content size — plus the mandatory header checksum."""
    flg = (1 << 6) | (1 << 5)  # version 01, block independence
    bd = 7 << 4                # 4 MB max block size
    desc = bytes([flg, bd])
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for i in range(0, len(data), _BLOCK_MAX):
        chunk = data[i : i + _BLOCK_MAX]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:  # incompressible: store raw with the uncompressed bit
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if len(data) < 7:
        raise ValueError("lz4: truncated frame header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad frame magic {magic:#x}")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    has_content_size = bool(flg & 0x08)
    has_content_checksum = bool(flg & 0x04)
    has_block_checksum = bool(flg & 0x10)
    pos = 6  # past FLG+BD
    content_size = None
    if has_content_size:
        (content_size,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    if flg & 0x01:  # DictID
        pos += 4
    hc = data[pos]
    desc = data[4:pos]
    if ((xxh32(desc) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: header checksum mismatch")
    pos += 1
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (word,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if word == 0:  # EndMark
            break
        size = word & 0x7FFFFFFF
        if pos + size > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos : pos + size]
        pos += size
        if word & 0x80000000:
            out += block
        else:
            out += lz4_block_decompress(block)
        if has_block_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != want:
                raise ValueError("lz4: block checksum mismatch")
    if has_content_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != want:
            raise ValueError("lz4: content checksum mismatch")
    if content_size is not None and content_size != len(out):
        raise ValueError(
            f"lz4: content size {len(out)} != declared {content_size}"
        )
    return bytes(out)
