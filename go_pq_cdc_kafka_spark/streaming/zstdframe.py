"""Zstandard frame codec implemented from the public specification
(RFC 8878 / Zstandard Compression Format) in pure Python.

Why this exists: the reference's delivery config accepts
``compression: zstd`` (config/config.go:59-64 via its Kafka client
library), and Kafka record batches mark zstd with attributes bits 0x4.
The jar-backed sink passes zstd through to the Java client; this module
makes the jar-free wire path (streaming/kafka_wire.py) executable for
zstd as well — the last wire-path codec gap.

Scope:

- :func:`zstd_decompress` — a COMPLETE decoder for standard frames:
  both frame header forms (single-segment or windowed, all FCS field
  sizes), raw / RLE / compressed blocks, all four literals block types
  (raw, RLE, Huffman-compressed with 1 or 4 streams, treeless repeat),
  Huffman table descriptions (direct 4-bit weights and FSE-compressed
  weights), sequences under all symbol-compression modes (predefined,
  RLE, FSE-compressed, repeat), the three-slot repeat-offset machinery
  with its literals_length==0 shifts, and the XXH64 content checksum.
  Skippable frames are skipped; dictionary frames are rejected loudly.
- :func:`zstd_compress` — a spec-valid ENCODER emitting raw (stored)
  blocks in a single-segment frame with explicit frame-content size and
  an XXH64 checksum. Any conforming decoder accepts its output; it
  trades ratio for simplicity exactly like the stored-block deflate
  fallback common in pure-Python encoders. (Entropy-coded output is
  what gzip/snappy/lz4 are for on this path; zstd support is about
  interoperability with zstd-speaking peers, not ratio.)

Nothing here is translated from libzstd — the implementation follows
the RFC's format description; tests validate against a real ``zstd``
CLI when one exists in the environment and against embedded vectors
otherwise.
"""

from __future__ import annotations

import struct

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

# --------------------------------------------------------------------------
# XXH64 (public algorithm; the zstd content checksum keeps its LOW 4
# bytes). Distinct from the XXH32 in lz4frame.py.
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl64(acc, 31) * _P1) & _M64


def _merge64(h: int, v: int) -> int:
    h ^= _round64(0, v)
    return (h * _P1 + _P4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            v1 = _round64(v1, l1)
            v2 = _round64(v2, l2)
            v3 = _round64(v3, l3)
            v4 = _round64(v4, l4)
            pos += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        h = _merge64(h, v1)
        h = _merge64(h, v2)
        h = _merge64(h, v3)
        h = _merge64(h, v4)
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while pos + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, pos)
        h ^= _round64(0, k)
        h = (_rotl64(h, 27) * _P1 + _P4) & _M64
        pos += 8
    if pos + 4 <= n:
        (k,) = struct.unpack_from("<I", data, pos)
        h ^= (k * _P1) & _M64
        h = (_rotl64(h, 23) * _P2 + _P3) & _M64
        pos += 4
    while pos < n:
        h ^= (data[pos] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        pos += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


# --------------------------------------------------------------------------
# Backward bitstream reader (RFC 8878 §3.1.1.4: entropy bitstreams are
# read from the last byte backward; the highest set bit of the last byte
# is a padding sentinel and is discarded). Reads past the start of the
# stream return zero bits in the LOW positions and set ``overflowed`` —
# the FSE huffman-weights decoder uses that as its termination signal.
# --------------------------------------------------------------------------


class _BackBits:
    def __init__(self, data: bytes):
        if not data:
            raise ValueError("zstd: empty bitstream")
        self.data = data
        last = data[-1]
        if last == 0:
            raise ValueError("zstd: bitstream last byte is zero (no sentinel)")
        pad = 8 - last.bit_length()
        self.bits_left = 8 * len(data) - pad - 1  # sentinel consumed
        self.overflowed = False

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if n > self.bits_left:
            have = max(self.bits_left, 0)
            val = self._peek(have) << (n - have) if have > 0 else 0
            self.bits_left -= n
            self.overflowed = True
            return val
        val = self._peek(n)
        self.bits_left -= n
        return val

    def _peek(self, n: int) -> int:
        end = self.bits_left
        start = end - n
        first_byte = start // 8
        last_byte = (end - 1) // 8
        chunk = int.from_bytes(self.data[first_byte : last_byte + 1], "little")
        return (chunk >> (start - first_byte * 8)) & ((1 << n) - 1)


# --------------------------------------------------------------------------
# FSE (Finite State Entropy) — RFC 8878 §4.1.
# --------------------------------------------------------------------------


class _FseTable:
    __slots__ = ("accuracy_log", "symbol", "num_bits", "baseline")

    def __init__(self, accuracy_log: int, norm: list[int]):
        """Decoding table from normalized probabilities. ``norm[s]`` is
        the probability of symbol s; -1 means "less than 1" (one cell at
        the table top, max bits, baseline 0)."""
        size = 1 << accuracy_log
        self.accuracy_log = accuracy_log
        self.symbol = [0] * size
        self.num_bits = [0] * size
        self.baseline = [0] * size

        high_threshold = size - 1
        for s, p in enumerate(norm):
            if p == -1:
                self.symbol[high_threshold] = s
                high_threshold -= 1
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, p in enumerate(norm):
            if p <= 0:
                continue
            for _ in range(p):
                self.symbol[pos] = s
                pos = (pos + step) & mask
                while pos > high_threshold:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("zstd: corrupt FSE distribution (spread)")

        # cells of a symbol with probability p get x = p..2p-1 in
        # ascending table position; num_bits = AL - floor(log2 x),
        # baseline = (x << num_bits) - size
        next_x = [p if p > 0 else 0 for p in norm]
        for i in range(high_threshold + 1):
            s = self.symbol[i]
            x = next_x[s]
            next_x[s] = x + 1
            nb = accuracy_log - (x.bit_length() - 1)
            self.num_bits[i] = nb
            self.baseline[i] = (x << nb) - size
        for i in range(high_threshold + 1, size):
            self.num_bits[i] = accuracy_log
            self.baseline[i] = 0


class _RleTable:
    """Degenerate 1-cell table for the RLE sequence mode."""

    accuracy_log = 0

    def __init__(self, sym: int):
        self.symbol = [sym]
        self.num_bits = [0]
        self.baseline = [0]


def _read_fse_table(
    data: bytes, pos: int, max_accuracy: int
) -> tuple[_FseTable, int]:
    """Parse an FSE table description (FORWARD bitstream) — RFC §4.1.1.
    Returns (table, byte position after the description)."""
    bitpos = 0

    def read_bits(n: int) -> int:
        nonlocal bitpos
        byte0 = pos + bitpos // 8
        last_byte = pos + (bitpos + n - 1) // 8
        if last_byte >= len(data):
            raise ValueError("zstd: truncated FSE table description")
        chunk = int.from_bytes(data[byte0 : last_byte + 1], "little")
        val = (chunk >> (bitpos % 8)) & ((1 << n) - 1)
        bitpos += n
        return val

    accuracy_log = read_bits(4) + 5
    if accuracy_log > max_accuracy:
        raise ValueError("zstd: FSE accuracy log too large")
    remaining = (1 << accuracy_log) + 1
    norm: list[int] = []
    while remaining > 1:
        nbits = remaining.bit_length()
        val = read_bits(nbits)
        lower_mask = (1 << (nbits - 1)) - 1
        threshold = (1 << nbits) - 1 - remaining
        if (val & lower_mask) < threshold:
            bitpos -= 1  # small value: one bit fewer was needed
            val &= lower_mask
        elif val > lower_mask:
            val -= threshold
        prob = val - 1
        norm.append(prob)
        remaining -= -prob if prob < 0 else prob
        if prob == 0:
            while True:
                rep = read_bits(2)
                norm.extend([0] * rep)
                if rep != 3:
                    break
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE normalized distribution")
    return _FseTable(accuracy_log, norm), pos + (bitpos + 7) // 8


# --------------------------------------------------------------------------
# Huffman literals — RFC 8878 §4.2.
# --------------------------------------------------------------------------


class _HufTable:
    __slots__ = ("max_bits", "symbols", "lengths")

    def __init__(self, weights: list[int]):
        """Canonical decoding table from explicit symbol weights; the
        LAST present symbol's weight is implied (it completes the sum of
        2^(w-1) to the next power of two)."""
        total = sum((1 << (w - 1)) for w in weights if w > 0)
        if total == 0:
            raise ValueError("zstd: empty huffman weights")
        k = total.bit_length()
        if (1 << k) <= total:  # pragma: no cover — bit_length guarantees
            k += 1
        last_part = (1 << k) - total
        if last_part & (last_part - 1):
            raise ValueError("zstd: huffman weights do not complete a power of 2")
        weights = weights + [last_part.bit_length()]
        max_bits = k
        self.max_bits = max_bits
        size = 1 << max_bits
        self.symbols = bytearray(size)
        self.lengths = bytearray(size)
        # entries with the most bits (lowest weight) occupy the lowest
        # table indices; ties resolve in natural symbol order
        idx = 0
        for s in sorted(
            (s for s, w in enumerate(weights) if w > 0),
            key=lambda s: (weights[s], s),
        ):
            w = weights[s]
            length = max_bits + 1 - w
            span = 1 << (max_bits - length)
            self.symbols[idx : idx + span] = bytes([s]) * span
            self.lengths[idx : idx + span] = bytes([length]) * span
            idx += span
        if idx != size:
            raise ValueError("zstd: huffman table does not fill")

    def decode_stream(self, bits: _BackBits, n_out: int) -> bytes:
        out = bytearray(n_out)
        max_bits = self.max_bits
        mask = (1 << max_bits) - 1
        state = bits.read(max_bits)
        for i in range(n_out):
            out[i] = self.symbols[state]
            state = ((state << self.lengths[state]) & mask) | bits.read(
                self.lengths[state]
            )
        return bytes(out)


def _decode_huf_weights(data: bytes, pos: int) -> tuple[list[int], int]:
    """Huffman tree description → explicit weights (without the implied
    last). Direct form for header byte >= 128, FSE-compressed below."""
    header = data[pos]
    pos += 1
    if header >= 128:
        n_syms = header - 127
        nbytes = (n_syms + 1) // 2
        raw = data[pos : pos + nbytes]
        if len(raw) < nbytes:
            raise ValueError("zstd: truncated direct huffman weights")
        weights = []
        for i in range(n_syms):
            b = raw[i // 2]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        # n_syms weights transmitted; the LAST PRESENT symbol's weight is
        # an extra implied one, appended by _HufTable
        return weights, pos + nbytes
    comp = data[pos : pos + header]
    if len(comp) < header:
        raise ValueError("zstd: truncated FSE huffman weights")
    table, tpos = _read_fse_table(comp, 0, 6)
    bits = _BackBits(comp[tpos:])
    al = table.accuracy_log
    s1 = bits.read(al)
    s2 = bits.read(al)
    weights: list[int] = []
    # two interleaved states; a state update that drains past the stream
    # start ends decoding after the OTHER state flushes its symbol
    while True:
        weights.append(table.symbol[s1])
        s1 = table.baseline[s1] + bits.read(table.num_bits[s1])
        if bits.overflowed:
            weights.append(table.symbol[s2])
            break
        weights.append(table.symbol[s2])
        s2 = table.baseline[s2] + bits.read(table.num_bits[s2])
        if bits.overflowed:
            weights.append(table.symbol[s1])
            break
        if len(weights) > 255:
            raise ValueError("zstd: runaway huffman weight stream")
    return weights, pos + header


# --------------------------------------------------------------------------
# Sequences — RFC 8878 §3.1.1.3.2.
# --------------------------------------------------------------------------

# literals-length codes: (baseline, extra bits)
_LL_TABLE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
# match-length codes
_ML_TABLE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15), (65539, 16),
]

# predefined distributions (RFC 8878 §3.1.1.3.2.2.1)
_LL_DEFAULT = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2, 2, 2,
    2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1,
]
_ML_DEFAULT = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
_OF_DEFAULT = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    -1, -1, -1, -1, -1,
]

_LL_DEFAULT_TABLE = _FseTable(6, _LL_DEFAULT)
_ML_DEFAULT_TABLE = _FseTable(6, _ML_DEFAULT)
_OF_DEFAULT_TABLE = _FseTable(5, _OF_DEFAULT)

_MODE_PREDEFINED, _MODE_RLE, _MODE_FSE, _MODE_REPEAT = 0, 1, 2, 3


class _ZstdDecoder:
    """Per-frame state: the huffman table, the three sequence tables and
    the repeat offsets persist across blocks within one frame."""

    def __init__(self) -> None:
        self.huf: _HufTable | None = None
        self.ll_table = None
        self.ml_table = None
        self.of_table = None
        self.rep = [1, 4, 8]

    # -- literals section ---------------------------------------------

    def _decode_literals(self, block: bytes, pos: int) -> tuple[bytes, int]:
        b0 = block[pos]
        lit_type = b0 & 0x3
        size_format = (b0 >> 2) & 0x3
        if lit_type in (0, 1):  # Raw / RLE
            if size_format in (0, 2):
                regen = b0 >> 3
                pos += 1
            elif size_format == 1:
                regen = (b0 >> 4) | (block[pos + 1] << 4)
                pos += 2
            else:
                regen = (
                    (b0 >> 4) | (block[pos + 1] << 4) | (block[pos + 2] << 12)
                )
                pos += 3
            if lit_type == 0:
                lits = block[pos : pos + regen]
                if len(lits) < regen:
                    raise ValueError("zstd: truncated raw literals")
                return lits, pos + regen
            return bytes([block[pos]]) * regen, pos + 1
        # Compressed (2) / Treeless (3)
        if size_format == 0:
            n_streams = 1
            regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
            comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
            pos += 3
        elif size_format == 1:
            n_streams = 4
            regen = (b0 >> 4) | ((block[pos + 1] & 0x3F) << 4)
            comp = (block[pos + 1] >> 6) | (block[pos + 2] << 2)
            pos += 3
        elif size_format == 2:
            n_streams = 4
            regen = (
                (b0 >> 4)
                | (block[pos + 1] << 4)
                | ((block[pos + 2] & 0x3) << 12)
            )
            comp = (block[pos + 2] >> 2) | (block[pos + 3] << 6)
            pos += 4
        else:
            n_streams = 4
            regen = (
                (b0 >> 4)
                | (block[pos + 1] << 4)
                | ((block[pos + 2] & 0x3F) << 12)
            )
            comp = (
                (block[pos + 2] >> 6)
                | (block[pos + 3] << 2)
                | (block[pos + 4] << 10)
            )
            pos += 5
        end = pos + comp
        if end > len(block):
            raise ValueError("zstd: truncated compressed literals")
        if lit_type == 2:
            weights, wpos = _decode_huf_weights(block, pos)
            self.huf = _HufTable(weights)
            body = block[wpos:end]
        else:
            if self.huf is None:
                raise ValueError("zstd: treeless literals with no previous table")
            body = block[pos:end]
        huf = self.huf
        if n_streams == 1:
            return huf.decode_stream(_BackBits(body), regen), end
        if len(body) < 6:
            raise ValueError("zstd: truncated 4-stream jump table")
        s1, s2, s3 = struct.unpack_from("<HHH", body, 0)
        starts = [6, 6 + s1, 6 + s1 + s2, 6 + s1 + s2 + s3]
        sizes = [s1, s2, s3, len(body) - starts[3] + 6 - 6]
        sizes[3] = len(body) - starts[3]
        if sizes[3] <= 0:
            raise ValueError("zstd: corrupt 4-stream sizes")
        per = (regen + 3) // 4
        out = bytearray()
        for i in range(4):
            n_i = per if i < 3 else regen - 3 * per
            stream = body[starts[i] : starts[i] + sizes[i]]
            out += huf.decode_stream(_BackBits(stream), n_i)
        return bytes(out), end

    # -- sequences section --------------------------------------------

    def _seq_table(self, block: bytes, pos: int, mode: int, which: str) -> int:
        defaults = {
            "ll": (_LL_DEFAULT_TABLE, 9),
            "of": (_OF_DEFAULT_TABLE, 8),
            "ml": (_ML_DEFAULT_TABLE, 9),
        }
        default_table, max_al = defaults[which]
        attr = f"{which}_table"
        if mode == _MODE_PREDEFINED:
            setattr(self, attr, default_table)
        elif mode == _MODE_RLE:
            setattr(self, attr, _RleTable(block[pos]))
            pos += 1
        elif mode == _MODE_FSE:
            table, pos = _read_fse_table(block, pos, max_al)
            setattr(self, attr, table)
        elif getattr(self, attr) is None:
            raise ValueError(f"zstd: repeat mode for {which} with no previous table")
        return pos

    def decode_block(self, block: bytes, out: bytearray) -> None:
        """Decode one compressed block APPENDING to ``out`` — matches may
        reference bytes produced by earlier blocks of the same frame (the
        window is frame-wide), so the caller's accumulated frame output
        is the decode buffer."""
        lits, pos = self._decode_literals(block, 0)
        b0 = block[pos]
        if b0 == 0:
            out += lits
            return
        if b0 < 128:
            n_seq = b0
            pos += 1
        elif b0 < 255:
            n_seq = ((b0 - 128) << 8) + block[pos + 1]
            pos += 2
        else:
            n_seq = block[pos + 1] + (block[pos + 2] << 8) + 0x7F00
            pos += 3
        modes = block[pos]
        pos += 1
        if modes & 0x3:
            raise ValueError("zstd: reserved sequence-mode bits set")
        pos = self._seq_table(block, pos, (modes >> 6) & 0x3, "ll")
        pos = self._seq_table(block, pos, (modes >> 4) & 0x3, "of")
        pos = self._seq_table(block, pos, (modes >> 2) & 0x3, "ml")

        bits = _BackBits(block[pos:])
        ll_t, of_t, ml_t = self.ll_table, self.of_table, self.ml_table
        ll_state = bits.read(ll_t.accuracy_log)
        of_state = bits.read(of_t.accuracy_log)
        ml_state = bits.read(ml_t.accuracy_log)

        lit_pos = 0
        rep = self.rep
        for i in range(n_seq):
            of_code = of_t.symbol[of_state]
            ml_code = ml_t.symbol[ml_state]
            ll_code = ll_t.symbol[ll_state]
            # bit-read order: offset extra bits, then ML, then LL
            of_value = (1 << of_code) + bits.read(of_code)
            ml_base, ml_bits = _ML_TABLE[ml_code]
            match_len = ml_base + bits.read(ml_bits)
            ll_base, ll_bits = _LL_TABLE[ll_code]
            lit_len = ll_base + bits.read(ll_bits)

            if of_value > 3:
                offset = of_value - 3
                rep[2] = rep[1]
                rep[1] = rep[0]
                rep[0] = offset
            else:
                idx = of_value - 1 if lit_len != 0 else of_value
                if idx == 0:
                    offset = rep[0]
                elif idx == 1:
                    offset = rep[1]
                    rep[1] = rep[0]
                    rep[0] = offset
                elif idx == 2:
                    offset = rep[2]
                    rep[2] = rep[1]
                    rep[1] = rep[0]
                    rep[0] = offset
                else:  # of_value == 3 with lit_len == 0
                    offset = rep[0] - 1
                    if offset == 0:
                        raise ValueError("zstd: corrupt repeat offset 0")
                    rep[2] = rep[1]
                    rep[1] = rep[0]
                    rep[0] = offset

            out += lits[lit_pos : lit_pos + lit_len]
            lit_pos += lit_len
            if offset > len(out):
                raise ValueError("zstd: match offset beyond decoded window")
            start = len(out) - offset
            for j in range(match_len):
                out.append(out[start + j])

            if i != n_seq - 1:
                ll_state = ll_t.baseline[ll_state] + bits.read(
                    ll_t.num_bits[ll_state]
                )
                ml_state = ml_t.baseline[ml_state] + bits.read(
                    ml_t.num_bits[ml_state]
                )
                of_state = of_t.baseline[of_state] + bits.read(
                    of_t.num_bits[of_state]
                )
        out += lits[lit_pos:]


def zstd_decompress(data: bytes) -> bytes:
    """Decode one or more concatenated zstd frames."""
    out = bytearray()
    pos = 0
    while pos + 4 <= len(data):
        (magic,) = struct.unpack_from("<I", data, pos)
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            (size,) = struct.unpack_from("<I", data, pos + 4)
            pos += 8 + size
            continue
        if magic != ZSTD_MAGIC:
            raise ValueError(f"zstd: bad magic 0x{magic:08x}")
        pos += 4
        fhd = data[pos]
        pos += 1
        fcs_flag = fhd >> 6
        single_segment = (fhd >> 5) & 1
        checksum_flag = (fhd >> 2) & 1
        dict_flag = fhd & 0x3
        if fhd & 0x08:
            raise ValueError("zstd: reserved frame header bit set")
        if not single_segment:
            pos += 1  # window descriptor (whole frames are buffered)
        if dict_flag:
            raise ValueError("zstd: dictionary frames unsupported")
        fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        fcs = None
        if fcs_size:
            fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
            pos += fcs_size

        dec = _ZstdDecoder()
        frame_out = bytearray()
        while True:
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 0x3
            bsize = bh >> 3
            if btype == 0:  # raw
                frame_out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:  # RLE: bsize is the REGENERATED size
                frame_out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                dec.decode_block(data[pos : pos + bsize], frame_out)
                pos += bsize
            else:
                raise ValueError("zstd: reserved block type")
            if last:
                break
        if fcs is not None and len(frame_out) != fcs:
            raise ValueError(
                f"zstd: frame content size mismatch ({len(frame_out)} != {fcs})"
            )
        if checksum_flag:
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if (xxh64(bytes(frame_out)) & 0xFFFFFFFF) != want:
                raise ValueError("zstd: content checksum mismatch")
        out += frame_out
    return bytes(out)


# --------------------------------------------------------------------------
# Encoder: spec-valid frames with raw (stored) blocks.
# --------------------------------------------------------------------------

_RAW_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size floor per the spec


def zstd_compress(data: bytes, checksum: bool = True) -> bytes:
    """Encode ``data`` as a standard single-segment zstd frame of raw
    blocks with explicit frame-content size (and, by default, an XXH64
    content checksum). See the module docstring for the ratio trade."""
    out = bytearray(struct.pack("<I", ZSTD_MAGIC))
    n = len(data)
    if n <= 255:
        fcs_flag, fcs_field = 0, n.to_bytes(1, "little")
    elif n <= 65535 + 256:
        fcs_flag, fcs_field = 1, (n - 256).to_bytes(2, "little")
    elif n < 1 << 32:
        fcs_flag, fcs_field = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs_field = 3, n.to_bytes(8, "little")
    out.append((fcs_flag << 6) | (1 << 5) | ((1 if checksum else 0) << 2))
    out += fcs_field
    if n == 0:
        out += (1).to_bytes(3, "little")  # empty last raw block
    else:
        pos = 0
        while pos < n:
            chunk = data[pos : pos + _RAW_BLOCK_MAX]
            pos += len(chunk)
            last = 1 if pos >= n else 0
            out += (last | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
    if checksum:
        out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
