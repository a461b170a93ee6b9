"""GIF decoder + encoder from the public GIF89a specification — the
LZW-compressed palette format web scrapes are full of. stdlib + numpy
only; no codec library.

Decoder: header + logical screen descriptor, global/local color tables,
extension skipping (graphic control parsed for transparency), image
descriptor, variable-width LSB-first LZW with CLEAR/EOI handling and
dictionary growth to 4096, Adam-style 4-pass interlace reordering. Returns
the FIRST frame as (H, W, 3) uint8 RGB (animation frames beyond the first
are out of scope for feature extraction — the loud NotImplementedError
path documents it).

Encoder: single-frame GIF89a with a caller-supplied palette, real LZW
compression (dictionary growth + CLEAR on overflow), optional interlace —
enough to synthesize fixtures that exercise every decoder path and to
write thumbnails without a library.
"""

from __future__ import annotations

import struct

import numpy as np

#: interlace pass layout per the spec: (start row, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return rows


# --- LZW (GIF variant: variable width, LSB-first, CLEAR/EOI codes) ---------


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = 0
    nbits = 0
    pos = 0
    code_size = min_code_size + 1
    dictionary: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None

    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("gif: LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            dictionary = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(dictionary):
            entry = dictionary[code]
            if prev is not None:
                dictionary.append(prev + entry[:1])
        elif code == len(dictionary) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
            dictionary.append(entry)
        else:
            raise ValueError(f"gif: invalid LZW code {code}")
        out += entry
        prev = entry
        if len(dictionary) == (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out[:n_pixels])


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    dictionary: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, code_size)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in dictionary:
            w = wk
            continue
        emit(dictionary[w], code_size)
        if next_code < 4096:
            dictionary[wk] = next_code
            # the ENCODER widens when it assigns 2^code_size; the decoder
            # widens when its table REACHES 2^code_size — same instant
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
            next_code += 1
        else:  # table full: reset, like real encoders do
            emit(clear, code_size)
            dictionary = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(dictionary[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a → (H, W, 3) uint8 RGB."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    try:
        return _decode_gif_body(payload)
    except (struct.error, IndexError) as e:
        raise ValueError(f"gif: truncated payload ({e})") from e


def _decode_gif_body(payload: bytes) -> np.ndarray:
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x7)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension: label + sub-blocks, all skippable here
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif b == 0x2C:  # image descriptor — the frame we decode
            left, top, iw, ih, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            table = gct
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x7)
                table = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if table is None:
                raise ValueError("gif: no color table for frame")
            min_code = payload[pos]
            pos += 1
            chunks = bytearray()
            while payload[pos]:
                ln = payload[pos]
                chunks += payload[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(chunks), min_code, iw * ih), np.uint8
            ).reshape(ih, iw)
            if iflags & 0x40:  # interlaced: rows arrive in 4-pass order
                ordered = np.zeros_like(idx)
                ordered[_interlace_order(ih)] = idx
                idx = ordered
            if int(idx.max(initial=0)) >= table.shape[0]:
                raise ValueError("gif: palette index out of range")
            frame = table[idx]
            if (iw, ih, left, top) != (w, h, 0, 0):
                # compose partial frame onto the logical screen
                screen = np.zeros((h, w, 3), np.uint8)
                screen[top : top + ih, left : left + iw] = frame
                frame = screen
            return frame
        elif b == 0x3B:  # trailer before any frame
            break
        else:
            raise ValueError(f"gif: unexpected block {b:#x}")
    raise ValueError("gif: no image frame found")


# --- encoder ---------------------------------------------------------------


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Single-frame GIF89a from (H, W) uint8 palette indices and an
    (N, 3) uint8 palette (N a power of two, 2..256)."""
    indices = np.asarray(indices, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = indices.shape
    n = palette.shape[0]
    if n & (n - 1) or not 2 <= n <= 256:
        raise ValueError("palette size must be a power of two in [2, 256]")
    if int(indices.max(initial=0)) >= n:
        raise ValueError("index out of palette range")
    depth = max((n - 1).bit_length(), 1)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += palette.tobytes()
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    if interlace:
        indices = indices[_interlace_order(h)]
    min_code = max(depth, 2)  # spec: minimum LZW code size >= 2
    out.append(min_code)
    stream = _lzw_encode(indices.tobytes(), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)
