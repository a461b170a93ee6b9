"""Baseline TIFF codec from the public TIFF 6.0 specification (stdlib +
numpy; no codec library) — the scanned-document format archival corpora
ship in.

Decoder: both byte orders (II/MM), first-IFD parsing with inline-vs-
offset value resolution, strip assembly (StripOffsets/StripByteCounts/
RowsPerStrip), Compression 1 (none), 5 (the spec's LZW variant —
MSB-first codes with the EARLY width change at 511/1023/2047) and 32773
(PackBits RLE, spec section 9), Predictor 2 (horizontal differencing,
the pairing real LZW writers default to), PhotometricInterpretation 0/1
(grayscale, WhiteIsZero inverted), 2 (RGB, extra samples dropped), 3
(palette via the 16-bit ColorMap, high byte), 8-bit samples,
PlanarConfiguration 1 (chunky). JPEG-in-TIFF, 16-bit samples and planar
layout raise loudly.

Encoder: single-IFD little-endian writer (gray or RGB; none/PackBits/LZW
compression, optional predictor, configurable RowsPerStrip) — fixture
synthesis and thumbnail writes.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}  # BYTE ASCII SHORT LONG RATIONAL


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """TIFF spec section 9: n in [0,127] → copy n+1 literal bytes;
    n in [-127,-1] → repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: PackBits output short of strip size")
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    """Greedy spec-shaped encoder: runs ≥ 3 become replicate packets."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out.append(257 - run)
            out.append(row[i])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (i - lit_start) < 128:
            run = 1
            while i + run < n and run < 128 and row[i + run] == row[i]:
                run += 1
            if run >= 3:
                break
            i += run
            if i - lit_start >= 128:
                i = lit_start + 128
                break
        out.append(i - lit_start - 1)
        out += row[lit_start:i]
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF 6.0 section 13 LZW: MSB-first bit packing, 256=Clear 257=EOI,
    table growth from 258 with the spec's EARLY code-width change (9→10
    at table length 511, not 512 — one earlier than GIF's variant)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = pos = 0
    code_size = 9

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    prev: bytes | None = None
    while len(out) < expected:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("tiff: LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= code_size
        code = (acc >> nbits) & ((1 << code_size) - 1)
        if code == EOI:
            break
        if code == CLEAR:
            table = fresh()
            code_size = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("tiff: invalid first LZW code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]  # KwKwK
            table.append(entry)
        else:
            raise ValueError(f"tiff: invalid LZW code {code}")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
    if len(out) < expected:
        raise ValueError("tiff: LZW output short of strip size")
    return bytes(out[:expected])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Encoder half of the same variant (early change mirrored: widen after
    assigning entry 2^size - 1; Clear re-emitted before the table could
    reach 12-bit overflow)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc = (acc << size) | code
        nbits += size
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)

    code_size = 9
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(CLEAR, code_size)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        if next_code == (1 << code_size) - 1 and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code >= 4093:  # reset well inside the 12-bit ceiling
            emit(CLEAR, code_size)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            code_size = 9
        w = bytes([b])
    if w:
        emit(table[w], code_size)
    emit(EOI, code_size)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> np.ndarray:
    """First IFD of a TIFF → (H, W, 3) uint8 RGB."""
    if payload[:4] == b"II*\x00":
        endian = "<"
    elif payload[:4] == b"MM\x00*":
        endian = ">"
    else:
        raise ValueError("not a TIFF payload")
    try:
        return _decode_tiff_body(payload, endian)
    except (struct.error, IndexError) as e:
        raise ValueError(f"tiff: truncated payload ({e})") from e


def _decode_tiff_body(payload: bytes, endian: str) -> np.ndarray:
    (ifd_off,) = struct.unpack_from(endian + "I", payload, 4)
    (n_entries,) = struct.unpack_from(endian + "H", payload, ifd_off)
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        base = ifd_off + 2 + i * 12
        tag, typ, count = struct.unpack_from(endian + "HHI", payload, base)
        size = _TYPE_SIZES.get(typ)
        if size is None:
            continue  # unknown value type: skip the tag, per spec advice
        total = size * count
        if total <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(endian + "I", payload, base + 8)
        if typ == 3:
            vals = list(struct.unpack_from(endian + f"{count}H", payload, voff))
        elif typ == 4:
            vals = list(struct.unpack_from(endian + f"{count}I", payload, voff))
        elif typ == 1:
            vals = list(payload[voff : voff + count])
        else:
            vals = [voff]  # ASCII/RATIONAL: offset only; unused here
        tags[tag] = vals

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"tiff: missing required tag {tag}")
            return default
        return v[0]

    width = one(256)
    height = one(257)
    compression = one(259, 1)
    photometric = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8])
    planar = one(284, 1)
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"tiff: only 8-bit samples (bits={bits})")
    if planar != 1:
        raise NotImplementedError("tiff: planar configuration 2 not supported")
    predictor = one(317, 1)
    if compression not in (1, 5, 32773):
        raise NotImplementedError(
            f"tiff: compression {compression} needs a codec (supported: "
            "none, LZW, PackBits)"
        )
    if predictor not in (1, 2):
        raise NotImplementedError(f"tiff: predictor {predictor} not supported")

    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("tiff: missing/mismatched strip tags")
    rows_per_strip = one(278, height)
    row_bytes = width * spp
    data = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        raw = payload[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("tiff: strip runs past payload")
        if compression == 32773:
            raw = _packbits_decode(raw, strip_rows * row_bytes)
        elif compression == 5:
            raw = _tiff_lzw_decode(raw, strip_rows * row_bytes)
        data += raw
        remaining_rows -= strip_rows
    if len(data) < height * row_bytes:
        raise ValueError("tiff: strip data short of image size")
    px = np.frombuffer(bytes(data), np.uint8, height * row_bytes).reshape(
        height, width, spp
    )
    if predictor == 2:  # horizontal differencing: undo by per-row cumsum
        px = np.cumsum(px.astype(np.uint32), axis=1).astype(np.uint8)

    if photometric in (0, 1):  # grayscale (0 = WhiteIsZero, inverted)
        g = px[:, :, 0]
        if photometric == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photometric == 2:  # RGB (+ extra samples such as alpha, dropped)
        if spp < 3:
            raise ValueError("tiff: RGB photometric needs >= 3 samples")
        return px[:, :, :3].copy()
    if photometric == 3:  # palette: 16-bit ColorMap, R then G then B planes
        cmap = tags.get(320)
        if not cmap or len(cmap) % 3:
            raise ValueError("tiff: paletted image missing ColorMap")
        n = len(cmap) // 3
        table = (
            np.array(cmap, np.uint32).reshape(3, n).T >> 8
        ).astype(np.uint8)
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= n:
            raise ValueError("tiff: palette index out of range")
        return table[idx]
    raise NotImplementedError(f"tiff: photometric {photometric} not supported")


def encode_tiff(
    arr: np.ndarray, packbits: bool = False, rows_per_strip: int | None = None,
    grayscale: bool = False, lzw: bool = False, predictor: bool = False,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB (or its R channel with ``grayscale``)
    as a little-endian single-IFD TIFF: uncompressed, ``packbits``, or
    ``lzw`` (optionally with the horizontal-differencing ``predictor``,
    the pairing real writers default to), in ``rows_per_strip``-row
    strips."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_tiff expects (H, W, 3) RGB")
    if packbits and lzw:
        raise ValueError("choose one compression")
    if predictor and not lzw:
        raise ValueError("predictor is only written with lzw here")
    h, w = arr.shape[:2]
    if grayscale:
        plane = arr[:, :, 0][:, :, None]
        spp, photometric = 1, 1
    else:
        plane = arr
        spp, photometric = 3, 2
    if predictor:
        diffed = plane.astype(np.int32)
        diffed[:, 1:] = diffed[:, 1:] - diffed[:, :-1]
        plane = (diffed & 0xFF).astype(np.uint8)
    rps = rows_per_strip or h
    row_bytes = w * spp
    flat = plane.reshape(h, row_bytes)

    strips: list[bytes] = []
    for y0 in range(0, h, rps):
        chunk = flat[y0 : y0 + rps].tobytes()
        if packbits:
            chunk = _packbits_encode(chunk)
        elif lzw:
            chunk = _tiff_lzw_encode(chunk)
        strips.append(chunk)

    entries = []  # (tag, type, count, value-or-bytes)

    def entry(tag, typ, vals):
        entries.append((tag, typ, vals))

    entry(256, 4, [w])
    entry(257, 4, [h])
    entry(258, 3, [8] * spp)
    entry(259, 3, [32773 if packbits else (5 if lzw else 1)])
    entry(262, 3, [photometric])
    entry(277, 3, [spp])
    entry(278, 4, [rps])
    entry(279, 4, [len(s) for s in strips])
    if predictor:
        entry(317, 3, [2])
    # 273 (StripOffsets) filled after layout below

    # layout: header(8) + IFD + value overflow area + strip data
    n_entries = len(entries) + 1  # + StripOffsets
    ifd_off = 8
    ifd_size = 2 + n_entries * 12 + 4
    overflow = bytearray()
    overflow_base = ifd_off + ifd_size

    def pack_vals(typ, vals):
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(f"<{len(vals)}{fmt}", *vals)

    fixed = []
    for tag, typ, vals in entries:
        raw = pack_vals(typ, vals)
        if len(raw) <= 4:
            fixed.append((tag, typ, len(vals), raw.ljust(4, b"\x00")))
        else:
            fixed.append(
                (tag, typ, len(vals),
                 struct.pack("<I", overflow_base + len(overflow)))
            )
            overflow += raw

    # strip offsets: data begins after the overflow area
    offsets_raw_size = 4 * len(strips)
    data_base = overflow_base + len(overflow) + (
        offsets_raw_size if len(strips) > 1 else 0
    )
    offs = []
    acc = data_base
    for s in strips:
        offs.append(acc)
        acc += len(s)
    raw = pack_vals(4, offs)
    if len(raw) <= 4:
        fixed.append((273, 4, len(offs), raw.ljust(4, b"\x00")))
    else:
        fixed.append(
            (273, 4, len(offs),
             struct.pack("<I", overflow_base + len(overflow)))
        )
        overflow += raw

    fixed.sort(key=lambda e: e[0])  # spec: entries in ascending tag order
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off))
    out += struct.pack("<H", n_entries)
    for tag, typ, count, val4 in fixed:
        out += struct.pack("<HHI", tag, typ, count) + val4
    out += struct.pack("<I", 0)  # no next IFD
    out += overflow
    for s in strips:
        out += s
    return bytes(out)
