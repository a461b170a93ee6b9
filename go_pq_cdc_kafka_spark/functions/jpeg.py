"""Baseline JPEG codec, implemented from the public ITU-T T.81 spec
(+ JFIF conventions) with stdlib + numpy — no codec library.

Decoder: baseline sequential DCT, 8-bit precision — SOI/APPn/COM/DQT/
DHT/SOF0/SOS/DRI/RSTn/EOI marker parsing, canonical Huffman table
construction (T.81 Annex C), entropy decode with 0xFF00 byte-stuffing and
restart-marker resync, DC prediction, AC run-length + EOB, EXTEND sign
recovery (F.2.2.1), dequantize + de-zigzag, float IDCT (exact for
DC-only blocks), level shift/clamp, Hmax/Vmax chroma replication
upsampling (4:4:4 / 4:2:2 / 4:2:0), and JFIF YCbCr→RGB.

Encoder: baseline, grayscale or YCbCr with optional 2x2 chroma
subsampling, the spec's example Annex K.1 quantization tables scaled by
libjpeg's quality curve (or caller-supplied tables), the spec's typical
Annex K.3 Huffman tables, forward DCT, optional restart intervals.

Determinism anchor (what makes a lossy codec oracle-checkable): a SOLID
block's forward DCT is DC-only, and with a quant table whose DC step
divides 8·(v-128) the quantization is lossless, so solid-color images
round-trip BIT-EXACTLY through the full entropy/DCT pipeline —
multimodal_jpeg_stats pins the codec against a SQL oracle that way, while
property tests bound the error on non-solid content.

Reference parity note: the reference connector ships payload bytes opaquely
(handler.go:5); decoding media payloads is part of this engine's
training-data tier, same as functions/multimodal.py's BMP/PNG/WAV codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants -------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

#: Annex K.1 example quantization tables (natural order after de-zigzag)
K1_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
K1_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

#: Annex K.3 typical Huffman tables: (bits[1..16], huffval)
K3_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
K3_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
K3_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
K3_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

# IDCT/DCT basis: orthonormal 2-D DCT-II matrix (float64). For a DC-only
# block the reconstruction is DC/8 exactly — integer in float64 — which is
# what makes solid-color round-trips bit-exact.
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


# --- Huffman (T.81 Annex C canonical code construction) --------------------


class _HuffDecoder:
    """(code length, code) → value lookup built per Annex C/F."""

    def __init__(self, bits: list[int], huffval: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = huffval[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("jpeg: invalid Huffman code")


def _huff_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """value → (code, length) for the encoder, same canonical ordering."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitReader:
    """Entropy-coded segment reader: 0xFF00 unstuffing, stops at markers;
    restart markers are consumed by the caller via resync()."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy data ran out")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError("jpeg: marker inside entropy segment")
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def resync(self, expected_rst: int) -> None:
        """Consume an RSTn marker at a restart boundary (byte-aligned)."""
        self.nbits = 0
        if self.pos + 2 > len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("jpeg: expected restart marker")
        marker = self.data[self.pos + 1]
        if marker != 0xD0 + expected_rst:
            raise ValueError(
                f"jpeg: restart marker out of sequence ({marker:#x})"
            )
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ---------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to an (H, W, 3) uint8 RGB array (grayscale
    replicated). Progressive (SOF2) and arithmetic coding raise loudly."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        # T.81 B.1.1.2: any marker may be preceded by optional 0xFF fill
        # bytes — skip them so the byte after the run is the marker code.
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: standalone
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        if seglen < 2 or pos + seglen > len(payload):
            raise ValueError("jpeg: truncated marker segment")
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    vals = np.frombuffer(seg, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    vals = np.frombuffer(seg, ">u2", 64, i).astype(np.int32)
                    i += 128
                nat = np.zeros(64, np.int32)
                nat[ZIGZAG] = vals
                qtables[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                huffval = list(seg[i + 17 : i + 17 + n])
                if len(bits) != 16 or len(huffval) != n:
                    raise ValueError("jpeg: truncated DHT segment")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, huffval)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: only baseline sequential DCT supported (SOF {marker:#x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            pos += seglen
            return _decode_scan(
                payload, pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        elif marker == 0xD9:  # EOI before SOS
            break
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("jpeg: no scan data found")


def _decode_scan(data, pos, frame, scan, qtables, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    br = _BitReader(data, pos)
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.resync(rst)
                rst = (rst + 1) % 8
                for c in comps:
                    pred[c["id"]] = 0
            for comp, tdc, tac in scan:
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, np.int32)
                        t = huff_dc[tdc].decode(br)
                        diff = _extend(br.receive(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = huff_ac[tac].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        nat = np.zeros(64, np.int32)
                        nat[ZIGZAG] = zz
                        block = _idct2((nat.reshape(8, 8) * q).astype(np.float64))
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    out_planes = []
    for c in comps:
        p = np.clip(np.round(planes[c["id"]]) + 128, 0, 255)
        # replicate up to full resolution, crop to (h, w)
        ry, rx = vmax // c["v"], hmax // c["h"]
        p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)[:h, :w]
        out_planes.append(p)

    if len(out_planes) == 1:
        g = out_planes[0].astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if len(out_planes) != 3:
        raise NotImplementedError("jpeg: only 1- or 3-component images")
    y, cb, cr = (p.astype(np.float64) for p in out_planes)
    cb -= 128.0
    cr -= 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def pad(self) -> None:
        """1-fill to byte boundary (spec: pad bits are 1s)."""
        while self.nbits:
            self.write(1, 1)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scaling curve over the Annex K tables."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * s + 50) // 100, 1, 255).astype(np.int32)


def _csize(v: int) -> int:
    """Magnitude category (number of bits) of a coefficient value."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, block, q, dctab, actab, pred):
    coef = np.round(_fdct2(block.astype(np.float64) - 128.0) / q).astype(np.int64)
    zz = coef.reshape(-1)[ZIGZAG]  # natural → zigzag order (zz[k]=nat[Z[k]])
    diff = int(zz[0]) - pred
    t = _csize(diff)
    code, ln = dctab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max(np.nonzero(zz)[0], default=0)
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = actab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        s = _csize(v)
        code, ln = actab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = actab[0x00]  # EOB
        bw.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
    luma_qtable: np.ndarray | None = None,
    chroma_qtable: np.ndarray | None = None,
    grayscale: bool = False,
) -> bytes:
    """Encode (H, W, 3) uint8 RGB (or grayscale with ``grayscale=True``,
    using the R channel) as baseline JFIF JPEG. ``subsample`` enables 2x2
    chroma averaging (4:2:0). Custom quant tables override the
    quality-scaled Annex K tables (natural order, shape (8, 8))."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    h, w = arr.shape[:2]
    ql = (luma_qtable if luma_qtable is not None
          else _quality_scale(K1_LUMA, quality).reshape(8, 8)).astype(np.int32)
    qc = (chroma_qtable if chroma_qtable is not None
          else _quality_scale(K1_CHROMA, quality).reshape(8, 8)).astype(np.int32)

    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
    cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
    y, cb, cr = (np.round(p) for p in (y, cb, cr))

    def pad_to(p, mh, mw):
        ph = (-p.shape[0]) % mh
        pw = (-p.shape[1]) % mw
        return np.pad(p, ((0, ph), (0, pw)), mode="edge")

    if grayscale:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0,
                  "plane": pad_to(y, 8, 8), "q": ql, "dc": 0, "ac": 0}]
    elif subsample:
        yp = pad_to(y, 16, 16)
        def sub(p):
            p = pad_to(p, 16, 16)
            return np.round(
                (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])
                / 4.0
            )
        comps = [
            {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": yp, "q": ql,
             "dc": 0, "ac": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": sub(cb), "q": qc,
             "dc": 1, "ac": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": sub(cr), "q": qc,
             "dc": 1, "ac": 1},
        ]
    else:
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": pad_to(y, 8, 8),
             "q": ql, "dc": 0, "ac": 0},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": pad_to(cb, 8, 8),
             "q": qc, "dc": 1, "ac": 1},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": pad_to(cr, 8, 8),
             "q": qc, "dc": 1, "ac": 1},
        ]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"  # APP0 JFIF

    def dqt(tq, table):
        zz = table.reshape(-1)[ZIGZAG]
        return (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(int(v) for v in zz))

    out += dqt(0, ql)
    if not grayscale:
        out += dqt(1, qc)

    nc = len(comps)
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        bits, huffval = spec
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(huffval)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, K3_DC_LUMA) + dht(1, 0, K3_AC_LUMA)
    if not grayscale:
        out += dht(0, 1, K3_DC_CHROMA) + dht(1, 1, K3_AC_CHROMA)

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    sos = bytes([nc])
    for c in comps:
        sos += bytes([c["id"], (c["dc"] << 4) | c["ac"]])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_dc = [_huff_encode_table(*K3_DC_LUMA), _huff_encode_table(*K3_DC_CHROMA)]
    enc_ac = [_huff_encode_table(*K3_AC_LUMA), _huff_encode_table(*K3_AC_CHROMA)]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = pad_to(c["plane"], mcuy * c["v"] * 8, mcux * c["h"] * 8)

    bw = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.pad()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                for c in comps:
                    pred[c["id"]] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        block = c["plane"][y0 : y0 + 8, x0 : x0 + 8]
                        pred[c["id"]] = _encode_block(
                            bw, block, c["q"], enc_dc[c["dc"]],
                            enc_ac[c["ac"]], pred[c["id"]],
                        )
            mcu_count += 1
    bw.pad()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
