"""From-scratch Apache Avro Object Container File (OCF) codec + Spark paths.

The reference ships CDC events to Kafka as opaque bytes the user's handler
produces (handler.go:5); in real deployments those payloads are very often
Avro (Debezium-style envelopes). Spark's native ``avro`` format needs the
``spark-avro`` jar, which this environment lacks — so this module implements
the PUBLIC Avro 1.11 specification (binary encoding + object container
files) in pure Python and mounts it on Spark's distributed primitives:

- ``read_avro(spark, path)`` — tries the native JVM ``avro`` format first
  (the fast path on any cluster that has the jar), then falls back to a
  ``binaryFile`` scan + Arrow-batched ``mapInPandas`` decode: one task per
  container file, nothing driver-side except a single header read for
  schema inference. At 100 TB the unit of parallelism is the file (OCF
  blocks inside one file decode sequentially — the format's own design),
  so ingest-side file sizing is the scale knob, exactly as with the JVM
  reader.
- ``write_avro(df, path)`` — distributed writer: each partition encodes its
  rows into one ``part-*.avro`` container file via ``mapInPandas``; the
  driver never materializes data.

Supported schema surface (decode AND encode): null, boolean, int, long,
float, double, bytes, string, record, enum, array, map, fixed, unions, and
the logical types date, timestamp-micros/millis, local-timestamp-micros,
and decimal (bytes or fixed). Unsupported constructs raise loudly — no
silent coercion.

Codecs: ``null``, ``deflate`` (raw RFC-1951, per the spec), ``snappy`` —
a from-spec pure-Python implementation of the public snappy format
(varint preamble, literal/copy tags, overlapping-copy run repetition) with
Avro's 4-byte big-endian CRC32-of-uncompressed block suffix, both
directions, so the most common real-world Avro files read without any
C library — plus the spec's optional ``bzip2`` and ``xz`` codecs via the
stdlib. Only ``zstandard`` remains library-gated.

Spec: https://avro.apache.org/docs/1.11.1/specification/ (public).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import hashlib
import io
import json
import os
import struct
import uuid
import zlib
from typing import Any, Callable, Iterator

MAGIC = b"Obj\x01"
_PRIMITIVES = frozenset(
    {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}
)


# ---------------------------------------------------------------------------
# binary primitives (Avro spec "Binary Encoding")
# ---------------------------------------------------------------------------


def encode_long(n: int, out: bytearray) -> None:
    z = (n << 1) ^ (n >> 63)  # zigzag; Python's arithmetic >> keeps this exact
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


class _Reader:
    """Cursor over one decompressed block (or header) of Avro binary."""

    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def read_long(self) -> int:
        buf, pos = self.buf, self.pos
        shift = acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        self.pos = pos
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise ValueError(f"negative byte-length {n} at offset {self.pos}")
        v = self.buf[self.pos : self.pos + n]
        if len(v) != n:
            raise ValueError("truncated Avro data (bytes run past buffer)")
        self.pos += n
        return v

    def read_fixed(self, n: int) -> bytes:
        v = self.buf[self.pos : self.pos + n]
        if len(v) != n:
            raise ValueError("truncated Avro data (fixed runs past buffer)")
        self.pos += n
        return v


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------


def _normalize_schema(schema: Any, named: dict | None = None) -> Any:
    """Resolve string references to named types and validate support."""
    if named is None:
        named = {}
    if isinstance(schema, str):
        if schema in _PRIMITIVES:
            return schema
        if schema in named:
            return named[schema]
        raise ValueError(f"unsupported or unresolved Avro type {schema!r}")
    if isinstance(schema, list):
        return [_normalize_schema(s, named) for s in schema]
    if isinstance(schema, dict):
        t = schema.get("type")
        if t in ("record", "enum", "fixed"):
            name = schema.get("name")
            if name:
                named[name] = schema
                ns = schema.get("namespace")
                if ns:
                    named[f"{ns}.{name}"] = schema
        if t == "record":
            for f in schema["fields"]:
                f["type"] = _normalize_schema(f["type"], named)
        elif t == "array":
            schema["items"] = _normalize_schema(schema["items"], named)
        elif t == "map":
            schema["values"] = _normalize_schema(schema["values"], named)
        elif t in _PRIMITIVES or t in ("enum", "fixed"):
            pass
        elif isinstance(t, (dict, list)):
            # {"type": {...nested...}} wrapper
            return _normalize_schema(t, named)
        else:
            raise ValueError(f"unsupported Avro complex type {t!r}")
        return schema
    raise ValueError(f"malformed Avro schema node {schema!r}")


def parse_schema(schema: str | dict | list) -> Any:
    """Parse + normalize. Works on a DEEP COPY: normalization replaces
    named-type string references with the defining dict in place, which
    must never leak into the caller's schema object (json.dumps of a
    mutated schema would inline shared definitions — an Avro name-
    redefinition error for stricter readers — or recurse forever on a
    self-referential record)."""
    import copy

    if isinstance(schema, str) and schema not in _PRIMITIVES:
        schema = json.loads(schema)
    else:
        schema = copy.deepcopy(schema)
    return _normalize_schema(schema)


def _logical(schema: Any) -> tuple[str, Any]:
    """(kind, schema) where kind folds in the logicalType when supported."""
    if isinstance(schema, dict):
        t, lt = schema.get("type"), schema.get("logicalType")
        if lt == "date" and t == "int":
            return "date", schema
        if lt == "timestamp-micros" and t == "long":
            return "timestamp-micros", schema
        if lt == "timestamp-millis" and t == "long":
            return "timestamp-millis", schema
        if lt == "local-timestamp-micros" and t == "long":
            return "local-timestamp-micros", schema
        if lt == "decimal" and t in ("bytes", "fixed"):
            return "decimal", schema
        return t, schema
    return schema, schema


# ---------------------------------------------------------------------------
# decoder: avro value -> python object
# ---------------------------------------------------------------------------


def _make_decoder(schema: Any) -> Callable[[_Reader], Any]:
    kind, sch = _logical(schema)
    if kind == "null":
        return lambda r: None
    if kind == "boolean":
        return lambda r: r.read_fixed(1) == b"\x01"
    if kind in ("int", "long"):
        return _Reader.read_long
    if kind == "float":
        return lambda r: struct.unpack("<f", r.read_fixed(4))[0]
    if kind == "double":
        return lambda r: struct.unpack("<d", r.read_fixed(8))[0]
    if kind == "bytes":
        return _Reader.read_bytes
    if kind == "string":
        return lambda r: r.read_bytes().decode("utf-8")
    if kind == "date":
        epoch = _dt.date(1970, 1, 1)
        return lambda r: epoch + _dt.timedelta(days=r.read_long())
    if kind in ("timestamp-micros", "local-timestamp-micros"):
        epoch = _dt.datetime(1970, 1, 1)
        return lambda r: epoch + _dt.timedelta(microseconds=r.read_long())
    if kind == "timestamp-millis":
        epoch = _dt.datetime(1970, 1, 1)
        return lambda r: epoch + _dt.timedelta(milliseconds=r.read_long())
    if kind == "decimal":
        scale = sch.get("scale", 0)
        size = sch.get("size") if sch.get("type") == "fixed" else None
        q = _decimal.Decimal(1).scaleb(-scale)

        def dec(r: _Reader) -> _decimal.Decimal:
            raw = r.read_fixed(size) if size is not None else r.read_bytes()
            unscaled = int.from_bytes(raw, "big", signed=True)
            return (_decimal.Decimal(unscaled) * q).quantize(q)

        return dec
    if kind == "fixed":
        n = sch["size"]
        return lambda r: r.read_fixed(n)
    if kind == "enum":
        symbols = sch["symbols"]
        return lambda r: symbols[r.read_long()]
    if kind == "record":
        pairs = [(f["name"], _make_decoder(f["type"])) for f in sch["fields"]]

        def rec(r: _Reader) -> dict:
            return {name: d(r) for name, d in pairs}

        return rec
    if kind == "array":
        item = _make_decoder(sch["items"])

        def arr(r: _Reader) -> list:
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix (skippable form)
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(item(r))

        return arr
    if kind == "map":
        val = _make_decoder(sch["values"])

        def mp(r: _Reader) -> dict:
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = val(r)

        return mp
    if isinstance(schema, list):  # union
        branches = [_make_decoder(b) for b in schema]

        def un(r: _Reader) -> Any:
            i = r.read_long()
            if not 0 <= i < len(branches):
                raise ValueError(f"union index {i} out of range")
            return branches[i](r)

        return un
    raise ValueError(f"unsupported Avro type {schema!r}")


# ---------------------------------------------------------------------------
# schema resolution: decode writer-schema bytes into reader-schema values
# (Avro spec "Schema Resolution" — the schema-evolution contract)
# ---------------------------------------------------------------------------

_PROMOTIONS = {
    ("int", "long"): lambda v: v,
    ("int", "float"): float,
    ("int", "double"): float,
    ("long", "float"): float,
    ("long", "double"): float,
    ("float", "double"): lambda v: v,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _default_value(schema: Any, default: Any) -> Any:
    """Convert a JSON-encoded field default to the runtime value."""
    kind, sch = _logical(schema)
    if isinstance(schema, list):  # union default applies to the FIRST branch
        return _default_value(schema[0], default)
    if kind == "null":
        return None
    if kind == "bytes" or kind == "fixed":
        # spec: bytes/fixed defaults are strings where each char is a byte
        return default.encode("latin-1") if isinstance(default, str) else default
    if kind == "date":
        return _dt.date(1970, 1, 1) + _dt.timedelta(days=default)
    if kind in ("timestamp-micros", "local-timestamp-micros"):
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=default)
    if kind == "timestamp-millis":
        return _dt.datetime(1970, 1, 1) + _dt.timedelta(milliseconds=default)
    if kind == "decimal":
        scale = sch.get("scale", 0)
        q = _decimal.Decimal(1).scaleb(-scale)
        return _decimal.Decimal(str(default)).quantize(q)
    if kind == "record":
        return {
            f["name"]: _default_value(f["type"], f.get("default"))
            for f in sch["fields"]
        }
    return default


def _make_branch_raiser(msg: str) -> Callable[[_Reader], Any]:
    def raiser(r: _Reader) -> Any:
        raise ValueError(f"datum selected an unresolvable union branch: {msg}")

    return raiser


def _make_skipper(schema: Any) -> Callable[[_Reader], None]:
    """Decode-and-discard for writer fields the reader dropped."""
    dec = _make_decoder(schema)
    return lambda r: (dec(r), None)[1]


def _make_resolver(writer: Any, reader: Any) -> Callable[[_Reader], Any]:
    """Decoder that reads WRITER-encoded bytes and yields READER values,
    per the spec's resolution rules: field matching by name, reader-side
    defaults for new fields, silent skip of dropped fields, numeric and
    string/bytes promotions, and union-branch matching."""
    wk, _ = _logical(writer)
    rk, _ = _logical(reader)

    if isinstance(writer, list):  # writer union: pick branch at runtime
        # per spec, a writer branch the reader cannot accept errors when a
        # DATUM selects it — not eagerly at schema-build time (the branch
        # may never be encountered)
        branch = []
        for b in writer:
            try:
                branch.append(_make_resolver(b, reader))
            except ValueError as e:
                branch.append(_make_branch_raiser(str(e)))

        def un(r: _Reader) -> Any:
            i = r.read_long()
            if not 0 <= i < len(branch):
                raise ValueError(f"union index {i} out of range")
            return branch[i](r)

        return un
    if isinstance(reader, list):  # writer single, reader union: first match
        for b in reader:
            try:
                return _make_resolver(writer, b)
            except ValueError:
                continue
        raise ValueError(
            f"writer type {wk!r} matches no branch of reader union"
        )

    if (wk, rk) in _PROMOTIONS:
        dec, conv = _make_decoder(writer), _PROMOTIONS[(wk, rk)]
        return lambda r: conv(dec(r))

    if wk != rk:
        raise ValueError(f"cannot resolve writer {wk!r} into reader {rk!r}")

    if wk == "record":
        wfields = writer["fields"]
        rfields = {f["name"]: f for f in reader["fields"]}
        steps: list[tuple[str | None, Callable]] = []
        for wf in wfields:
            rf = rfields.get(wf["name"])
            if rf is None:
                steps.append((None, _make_skipper(wf["type"])))
            else:
                steps.append((wf["name"], _make_resolver(wf["type"], rf["type"])))
        wnames = {f["name"] for f in wfields}
        fills = []
        for rf in reader["fields"]:
            if rf["name"] not in wnames:
                if "default" not in rf:
                    raise ValueError(
                        f"reader field {rf['name']!r} absent from writer "
                        "schema and has no default"
                    )
                fills.append((rf["name"], _default_value(rf["type"], rf["default"])))

        def rec(r: _Reader) -> dict:
            out = {}
            for name, step in steps:
                v = step(r)
                if name is not None:
                    out[name] = v
            for name, v in fills:
                out[name] = v
            return out

        return rec
    if wk == "array":
        item = _make_resolver(writer["items"], reader["items"])

        def arr(r: _Reader) -> list:
            out = []
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    out.append(item(r))

        return arr
    if wk == "map":
        val = _make_resolver(writer["values"], reader["values"])

        def mp(r: _Reader) -> dict:
            out = {}
            while True:
                n = r.read_long()
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    r.read_long()
                for _ in range(n):
                    k = r.read_bytes().decode("utf-8")
                    out[k] = val(r)

        return mp
    if wk == "enum":
        wsyms, rsyms = writer["symbols"], set(reader["symbols"])
        rdefault = reader.get("default")

        def en(r: _Reader) -> str:
            s = wsyms[r.read_long()]
            if s in rsyms:
                return s
            if rdefault is not None:
                return rdefault
            raise ValueError(f"enum symbol {s!r} unknown to reader schema")

        return en
    if wk == "fixed":
        if writer["size"] != reader["size"]:
            raise ValueError("fixed size mismatch between writer and reader")
        return _make_decoder(reader)
    return _make_decoder(reader)  # identical primitive / logical type


# ---------------------------------------------------------------------------
# encoder: python object -> avro binary
# ---------------------------------------------------------------------------


def _make_encoder(schema: Any) -> Callable[[Any, bytearray], None]:
    kind, sch = _logical(schema)
    if kind == "null":

        def e_null(v, out):
            if v is not None:
                raise ValueError(f"non-null value {v!r} for null type")

        return e_null
    if kind == "boolean":
        return lambda v, out: out.append(1 if v else 0)
    if kind in ("int", "long"):
        return lambda v, out: encode_long(int(v), out)
    if kind == "float":
        return lambda v, out: out.extend(struct.pack("<f", v))
    if kind == "double":
        return lambda v, out: out.extend(struct.pack("<d", v))
    if kind == "bytes":

        def e_bytes(v, out):
            b = bytes(v)
            encode_long(len(b), out)
            out.extend(b)

        return e_bytes
    if kind == "string":

        def e_str(v, out):
            b = str(v).encode("utf-8")
            encode_long(len(b), out)
            out.extend(b)

        return e_str
    if kind == "date":
        epoch = _dt.date(1970, 1, 1)
        return lambda v, out: encode_long((v - epoch).days, out)
    if kind in ("timestamp-micros", "local-timestamp-micros"):
        epoch = _dt.datetime(1970, 1, 1)

        def e_ts(v, out):
            if getattr(v, "tzinfo", None) is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            delta = v - epoch
            encode_long(
                (delta.days * 86_400 + delta.seconds) * 1_000_000
                + delta.microseconds,
                out,
            )

        return e_ts
    if kind == "timestamp-millis":
        epoch = _dt.datetime(1970, 1, 1)

        def e_tsm(v, out):
            delta = v - epoch
            encode_long(
                (delta.days * 86_400 + delta.seconds) * 1_000
                + delta.microseconds // 1_000,
                out,
            )

        return e_tsm
    if kind == "decimal":
        scale = sch.get("scale", 0)
        size = sch.get("size") if sch.get("type") == "fixed" else None

        def e_dec(v, out):
            unscaled = int(
                _decimal.Decimal(v).scaleb(scale).to_integral_value(
                    rounding=_decimal.ROUND_HALF_UP
                )
            )
            n = size if size is not None else max(1, (unscaled.bit_length() + 8) // 8)
            raw = unscaled.to_bytes(n, "big", signed=True)
            if size is None:
                encode_long(len(raw), out)
            out.extend(raw)

        return e_dec
    if kind == "fixed":
        n = sch["size"]

        def e_fix(v, out):
            b = bytes(v)
            if len(b) != n:
                raise ValueError(f"fixed({n}) got {len(b)} bytes")
            out.extend(b)

        return e_fix
    if kind == "enum":
        index = {s: i for i, s in enumerate(sch["symbols"])}
        return lambda v, out: encode_long(index[v], out)
    if kind == "record":
        pairs = [(f["name"], _make_encoder(f["type"])) for f in sch["fields"]]

        def e_rec(v, out):
            for name, enc in pairs:
                enc(v[name], out)

        return e_rec
    if kind == "array":
        item = _make_encoder(sch["items"])

        def e_arr(v, out):
            if v:
                encode_long(len(v), out)
                for x in v:
                    item(x, out)
            encode_long(0, out)

        return e_arr
    if kind == "map":
        val = _make_encoder(sch["values"])

        def e_map(v, out):
            if v:
                encode_long(len(v), out)
                for k, x in v.items():
                    b = str(k).encode("utf-8")
                    encode_long(len(b), out)
                    out.extend(b)
                    val(x, out)
            encode_long(0, out)

        return e_map
    if isinstance(schema, list):  # union: pick the first matching branch
        kinds = [_logical(b)[0] for b in schema]
        encoders = [_make_encoder(b) for b in schema]

        def e_un(v, out):
            i = _union_branch(kinds, v)
            encode_long(i, out)
            encoders[i](v, out)

        return e_un
    raise ValueError(f"unsupported Avro type {schema!r}")


def _union_branch(kinds: list, v: Any) -> int:
    if v is None:
        try:
            return kinds.index("null")
        except ValueError:
            raise ValueError("None for a union without a null branch") from None
    for i, k in enumerate(kinds):
        if k == "null":
            continue
        if k == "boolean" and isinstance(v, bool):
            return i
        if k in ("int", "long") and isinstance(v, int) and not isinstance(v, bool):
            return i
        if k in ("float", "double") and isinstance(v, float):
            return i
        if k == "string" and isinstance(v, str):
            return i
        if k in ("bytes", "fixed") and isinstance(v, (bytes, bytearray)):
            return i
        if k == "record" and isinstance(v, dict):
            return i
        if k == "array" and isinstance(v, list):
            return i
        if k == "map" and isinstance(v, dict):
            return i
        if k == "date" and isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return i
        if k.startswith(("timestamp", "local-timestamp")) and isinstance(
            v, _dt.datetime
        ):
            return i
        if k == "decimal" and isinstance(v, _decimal.Decimal):
            return i
        if k == "enum" and isinstance(v, str):
            return i
    raise ValueError(f"no union branch in {kinds} matches {type(v).__name__}")


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------


# --- snappy, implemented from the public format description
# (google/snappy format_description.txt): varint uncompressed-length
# preamble, then tagged elements — literals (tag 00, 1-4 length extension
# bytes past 60) and back-references with 1/2/4-byte little-endian offsets
# (tags 01/10/11). Copies may overlap (offset < length ⇒ run repetition).
# Avro frames each block as raw-snappy + 4-byte BIG-endian CRC32 of the
# UNCOMPRESSED bytes (Avro spec "Required Codecs: snappy").


def _snappy_decompress(data: bytes) -> bytes:
    n, pos, shift = 0, 0, 0
    while True:  # varint preamble
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        n |= (b & 0x7F) << shift
        pos += 1
        shift += 7
        if not b & 0x80:
            break
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            length = tag >> 2
            if length >= 60:  # 60..63 ⇒ that many minus 59 extension bytes
                nbytes = length - 59
                length = int.from_bytes(data[pos : pos + nbytes], "little")
                pos += nbytes
            length += 1
            if pos + length > len(data):
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x7)
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:  # overlapping copy: spec-defined run repetition, byte-wise
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != n:
        raise ValueError(
            f"snappy: decompressed {len(out)} bytes, preamble said {n}"
        )
    return bytes(out)


def _snappy_compress(data: bytes) -> bytes:
    """Greedy hash-table matcher (the reference implementation's shape):
    4-byte-prefix candidates, matches ≤ 64 bytes emitted as tag-10 copies
    (2-byte offsets — windows ≤ 65535 always fit), everything else as
    literals. Output is valid for ANY spec-conforming snappy reader."""
    n = len(data)
    out = bytearray()
    while True:  # varint preamble
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            break

    def emit_literal(chunk: bytes) -> None:
        i = 0
        while i < len(chunk):
            seg = chunk[i : i + 0x10000]  # 2-extension-byte max is 65536
            ln = len(seg) - 1
            if ln < 60:
                out.append(ln << 2)
            elif ln < 0x100:
                out.append(60 << 2)
                out.append(ln)
            else:
                out.append(61 << 2)
                out.extend(ln.to_bytes(2, "little"))
            out.extend(seg)
            i += len(seg)

    table: dict[bytes, int] = {}
    i, lit_start, total = 0, 0, len(data)
    while i + 4 <= total:
        key = data[i : i + 4]
        j = table.get(key, -1)
        table[key] = i
        if j >= 0 and i - j <= 0xFFFF:
            length = 4
            while (
                i + length < total
                and length < 64
                and data[j + length] == data[i + length]
            ):
                length += 1
            emit_literal(data[lit_start:i])
            out.append(((length - 1) << 2) | 2)
            out.extend((i - j).to_bytes(2, "little"))
            i += length
            lit_start = i
        else:
            i += 1
    emit_literal(data[lit_start:])
    return bytes(out)


def _codec_pair(codec: str):
    if codec == "null":
        return (lambda b: b), (lambda b: b)
    if codec == "deflate":  # raw RFC-1951 per spec (no zlib wrapper)
        def comp(b: bytes) -> bytes:
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            return c.compress(b) + c.flush()

        return comp, (lambda b: zlib.decompress(b, -15))
    if codec == "snappy":
        def comp(b: bytes) -> bytes:
            return _snappy_compress(b) + struct.pack(
                ">I", zlib.crc32(b) & 0xFFFFFFFF
            )

        def decomp(b: bytes) -> bytes:
            if len(b) < 4:
                raise ValueError("snappy block missing Avro CRC32 suffix")
            out = _snappy_decompress(b[:-4])
            want = struct.unpack(">I", b[-4:])[0]
            if zlib.crc32(out) & 0xFFFFFFFF != want:
                raise ValueError("snappy block CRC32 mismatch")
            return out

        return comp, decomp
    if codec == "bzip2":  # standard .bz2 stream per spec ("Optional Codecs")
        import bz2

        return bz2.compress, bz2.decompress
    if codec == "xz":  # standard .xz stream per spec ("Optional Codecs")
        import lzma

        return (
            lambda b: lzma.compress(b, format=lzma.FORMAT_XZ),
            lzma.decompress,
        )
    if codec == "zstandard":  # spec "Optional Codecs": raw zstd frames
        from go_pq_cdc_kafka_spark.streaming.zstdframe import (
            zstd_compress,
            zstd_decompress,
        )

        return zstd_compress, zstd_decompress
    raise ValueError(
        f"unsupported Avro codec {codec!r} "
        "(supported: null, deflate, snappy, bzip2, xz, zstandard)"
    )


def write_ocf(
    path: str,
    schema: str | dict | list,
    rows: Iterator[Any],
    codec: str = "null",
    block_rows: int = 4096,
    sync_marker: bytes | None = None,
) -> int:
    """Write one Avro Object Container File; returns the row count."""
    sch = parse_schema(schema if not isinstance(schema, str) else schema)
    enc = _make_encoder(sch)
    comp, _ = _codec_pair(codec)
    if sync_marker is None:
        # deterministic per (schema, path): reproducible fixtures, still
        # unique across files as the spec intends
        sync_marker = hashlib.md5(
            (json.dumps(schema, sort_keys=True, default=str) + path).encode()
        ).digest()
    if len(sync_marker) != 16:
        raise ValueError("sync marker must be 16 bytes")

    header = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema)
        if not isinstance(schema, str)
        else (json.dumps(schema) if schema in _PRIMITIVES else schema),
        "avro.codec": codec,
    }
    encode_long(len(meta), header)
    for k, v in meta.items():
        kb = k.encode()
        encode_long(len(kb), header)
        header.extend(kb)
        vb = v.encode()
        encode_long(len(vb), header)
        header.extend(vb)
    encode_long(0, header)
    header.extend(sync_marker)

    total = 0
    with open(path, "wb") as f:
        f.write(header)
        buf = bytearray()
        n_in_block = 0

        def flush():
            nonlocal buf, n_in_block
            if not n_in_block:
                return
            payload = comp(bytes(buf))
            blk = bytearray()
            encode_long(n_in_block, blk)
            encode_long(len(payload), blk)
            f.write(blk)
            f.write(payload)
            f.write(sync_marker)
            buf = bytearray()
            n_in_block = 0

        for row in rows:
            enc(row, buf)
            n_in_block += 1
            total += 1
            if n_in_block >= block_rows:
                flush()
        flush()
    return total


def read_ocf_header(data: bytes) -> tuple[Any, str, bytes, int]:
    """(parsed schema, codec, sync marker, body offset) from raw file bytes."""
    if data[:4] != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        n = r.read_long()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.read_long()
        for _ in range(n):
            k = r.read_bytes().decode("utf-8")
            meta[k] = r.read_bytes()
    sync = r.read_fixed(16)
    schema = parse_schema(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    return schema, codec, sync, r.pos


def read_ocf(data: bytes, reader_schema: Any = None) -> Iterator[Any]:
    """Decode every row of one container file held in memory. With
    ``reader_schema`` set, the file's own (writer) schema is resolved into
    it per the spec's schema-resolution rules — a directory can mix files
    written under different schema versions and still read uniformly."""
    schema, codec, sync, pos = read_ocf_header(data)
    _, decomp = _codec_pair(codec)
    if reader_schema is not None and reader_schema != schema:
        dec = _make_resolver(schema, reader_schema)
    else:
        dec = _make_decoder(schema)
    r = _Reader(data, pos)
    while r.pos < len(data):
        n_rows = r.read_long()
        payload = decomp(r.read_bytes())
        if r.read_fixed(16) != sync:
            raise ValueError("sync marker mismatch (corrupt or truncated file)")
        br = _Reader(payload)
        for _ in range(n_rows):
            yield dec(br)
        if br.pos != len(payload):
            raise ValueError(
                f"block decoded {br.pos} of {len(payload)} bytes — schema drift"
            )


# ---------------------------------------------------------------------------
# Spark <-> Avro schema mapping
# ---------------------------------------------------------------------------


def avro_to_spark_schema(schema: Any):
    from pyspark.sql import types as T

    def conv(s: Any, nullable: bool = False):
        kind, sch = _logical(s)
        if isinstance(s, list):  # union
            non_null = [b for b in s if _logical(b)[0] != "null"]
            if len(non_null) != 1:
                raise ValueError(
                    "only unions of null with one branch map to Spark types"
                )
            dt, _ = conv(non_null[0])
            return dt, True
        simple = {
            "boolean": T.BooleanType(),
            "int": T.IntegerType(),
            "long": T.LongType(),
            "float": T.FloatType(),
            "double": T.DoubleType(),
            "bytes": T.BinaryType(),
            "string": T.StringType(),
            "date": T.DateType(),
            "timestamp-micros": T.TimestampType(),
            "timestamp-millis": T.TimestampType(),
            "local-timestamp-micros": T.TimestampNTZType(),
            "enum": T.StringType(),
            "fixed": T.BinaryType(),
        }
        if kind in simple:
            return simple[kind], nullable
        if kind == "decimal":
            return T.DecimalType(sch.get("precision", 38), sch.get("scale", 0)), nullable
        if kind == "record":
            fields = []
            for f in sch["fields"]:
                dt, nul = conv(f["type"])
                fields.append(T.StructField(f["name"], dt, nul))
            return T.StructType(fields), nullable
        if kind == "array":
            dt, nul = conv(sch["items"])
            return T.ArrayType(dt, nul), nullable
        if kind == "map":
            dt, nul = conv(sch["values"])
            return T.MapType(T.StringType(), dt, nul), nullable
        if kind == "null":
            raise ValueError("bare null type has no Spark mapping")
        raise ValueError(f"unsupported Avro type {s!r}")

    dt, _ = conv(schema)
    from pyspark.sql.types import StructType

    if not isinstance(dt, StructType):
        raise ValueError("top-level Avro schema must be a record")
    return dt


def spark_to_avro_schema(schema, name: str = "row") -> dict:
    from pyspark.sql import types as T

    def conv(dt, nullable: bool, path: str):
        if isinstance(dt, T.BooleanType):
            base: Any = "boolean"
        elif isinstance(dt, T.IntegerType):
            base = "int"
        elif isinstance(dt, (T.LongType, T.ShortType, T.ByteType)):
            base = "long"
        elif isinstance(dt, T.FloatType):
            base = "float"
        elif isinstance(dt, T.DoubleType):
            base = "double"
        elif isinstance(dt, T.BinaryType):
            base = "bytes"
        elif isinstance(dt, T.StringType):
            base = "string"
        elif isinstance(dt, T.DateType):
            base = {"type": "int", "logicalType": "date"}
        elif isinstance(dt, T.TimestampType):
            base = {"type": "long", "logicalType": "timestamp-micros"}
        elif isinstance(dt, T.TimestampNTZType):
            base = {"type": "long", "logicalType": "local-timestamp-micros"}
        elif isinstance(dt, T.DecimalType):
            base = {
                "type": "bytes",
                "logicalType": "decimal",
                "precision": dt.precision,
                "scale": dt.scale,
            }
        elif isinstance(dt, T.StructType):
            base = {
                "type": "record",
                "name": f"{path}_rec",
                "fields": [
                    {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)}
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.ArrayType):
            base = {
                "type": "array",
                "items": conv(dt.elementType, dt.containsNull, f"{path}_item"),
            }
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise ValueError("Avro maps require string keys")
            base = {
                "type": "map",
                "values": conv(dt.valueType, dt.valueContainsNull, f"{path}_val"),
            }
        else:
            raise ValueError(f"no Avro mapping for Spark type {dt}")
        return ["null", base] if nullable else base

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable, f.name)}
            for f in schema.fields
        ],
    }


# ---------------------------------------------------------------------------
# datum-level column functions (the spark-avro from_avro/to_avro surface)
# ---------------------------------------------------------------------------


def _pandas():
    # pandas_udf resolves the stringified type hints (PEP 563 is active in
    # this module) against the FUNCTION's globals, so `pd` must exist at
    # module scope when the udf is built
    global pd
    import pandas as pd

    return pd


def to_avro(schema: str | dict, confluent_schema_id: int | None = None):
    """Arrow-batched serializer: STRUCT column → Avro-datum ``binary``.

    Mirrors spark-avro's ``to_avro`` without the jar: the returned
    pandas_udf encodes each struct row as a single Avro binary datum (no
    container framing). With ``confluent_schema_id`` set, bytes are
    prefixed with the Confluent Schema Registry wire format the Kafka
    ecosystem (Debezium, ksqlDB, sink connectors) expects: magic 0x00 +
    big-endian 4-byte schema id. Encoding is deterministic (fixed field
    order) so repeated runs produce byte-identical Kafka values."""
    pd = _pandas()
    from pyspark.sql.functions import pandas_udf

    sch = parse_schema(schema)
    prefix = (
        b"\x00" + int(confluent_schema_id).to_bytes(4, "big")
        if confluent_schema_id is not None
        else b""
    )
    field_names = [f["name"] for f in sch["fields"]]

    @pandas_udf("binary")
    def enc(pdf: pd.DataFrame) -> pd.Series:
        encoder = _make_encoder(sch)
        out = []
        for row in pdf.itertuples(index=False):
            rec = {
                name: (None if _is_na_scalar(v) else _pandas_to_avro(v))
                for name, v in zip(field_names, row)
            }
            buf = bytearray(prefix)
            encoder(rec, buf)
            out.append(bytes(buf))
        return pd.Series(out)

    return enc


def from_avro(
    schema: str | dict,
    confluent: bool = False,
    reader_schema: str | dict | None = None,
):
    """Arrow-batched deserializer: Avro-datum ``binary`` column → STRUCT.

    The inverse of :func:`to_avro`. With ``confluent=True`` the 5-byte
    Confluent header is validated (magic 0x00) and stripped; the schema id
    is NOT resolved against a registry — the caller supplies the writer
    schema, as spark-avro's ``from_avro`` does. ``reader_schema`` applies
    the spec's schema-resolution rules (new fields from defaults, dropped
    fields skipped, promotions) and determines the output struct type.
    Trailing bytes after the datum raise (schema drift must be loud, not
    silently truncated)."""
    pd = _pandas()
    from pyspark.sql.functions import pandas_udf

    sch = parse_schema(schema)
    rsch = parse_schema(reader_schema) if reader_schema is not None else None
    spark_schema = avro_to_spark_schema(rsch if rsch is not None else sch)
    names = [f.name for f in spark_schema.fields]

    @pandas_udf(spark_schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        if rsch is not None and rsch != sch:
            decoder = _make_resolver(sch, rsch)
        else:
            decoder = _make_decoder(sch)
        rows = []
        for b in s:
            data = bytes(b)
            if confluent:
                if len(data) < 5 or data[0] != 0:
                    raise ValueError(
                        "not a Confluent-framed Avro value (magic byte != 0)"
                    )
                data = data[5:]
            r = _Reader(data)
            rows.append(decoder(r))
            if r.pos != len(data):
                raise ValueError(
                    f"datum decoded {r.pos} of {len(data)} bytes — "
                    "writer/reader schema mismatch"
                )
        return pd.DataFrame(rows, columns=names)

    return dec


def _is_na_scalar(v: Any) -> bool:
    import pandas as pd

    try:
        return v is None or bool(pd.isna(v))
    except (TypeError, ValueError):  # arrays/lists: pd.isna is elementwise
        return False


def _pandas_to_avro(v: Any) -> Any:
    """Normalize pandas/numpy scalars out of a struct row for encoding."""
    import numpy as np
    import pandas as pd

    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, np.ndarray):
        return [_pandas_to_avro(x) for x in v]
    if isinstance(v, dict):
        return {k: _pandas_to_avro(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_pandas_to_avro(x) for x in v]
    return v


# ---------------------------------------------------------------------------
# distributed Spark paths
# ---------------------------------------------------------------------------


def _pdf_to_rows(pdf, schema) -> Iterator[dict]:
    """pandas partition -> python dicts with Avro-ready values (NaN of a
    nullable numeric column becomes None; timestamps become datetimes)."""
    import pandas as pd
    from pyspark.sql import types as T

    cols = {}
    for f in schema.fields:
        s = pdf[f.name]
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType)):
            s = s.map(lambda v: None if pd.isna(v) else v.to_pydatetime())
        elif isinstance(
            f.dataType, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            s = s.map(lambda v: None if pd.isna(v) else int(v))
        elif isinstance(f.dataType, (T.FloatType, T.DoubleType)):
            # fixture data carries no meaningful NaN: treat NaN as SQL null,
            # matching what the parquet round-trip of a null double yields
            s = s.map(lambda v: None if pd.isna(v) else float(v))
        else:
            s = s.map(lambda v: None if v is None else v)
        cols[f.name] = list(s)
    names = list(cols)
    for vals in zip(*cols.values()):
        yield dict(zip(names, vals))


def write_avro(df, path: str, codec: str = "null", block_rows: int = 4096) -> None:
    """Distributed Avro writer: one container file per input partition,
    encoded executor-side via mapInPandas — the driver never sees rows.
    All fields are written as nullable unions (Spark semantics)."""
    import pandas as pd

    os.makedirs(path, exist_ok=True)
    spark_schema = df.schema
    avro_schema = spark_to_avro_schema(spark_schema)

    def part(iterator):
        rows_buf: list[dict] = []
        for pdf in iterator:
            rows_buf.extend(_pdf_to_rows(pdf, spark_schema))
        if rows_buf:
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            n = write_ocf(fname, avro_schema, iter(rows_buf), codec, block_rows)
        else:
            n = 0
        yield pd.DataFrame({"rows": [n]})

    # count() forces every partition's write exactly once
    df.mapInPandas(part, "rows long").count()


def read_avro(
    spark,
    path: str,
    avro_schema: str | dict | None = None,
    batch_rows: int = 8192,
    reader_schema: str | dict | None = None,
):
    """Read Avro container files as a DataFrame.

    Fast path: the native JVM ``avro`` format when the spark-avro jar is on
    the classpath. Fallback: ``binaryFile`` scan (one task per file, the
    OCF parallelism unit) + pure-Python block decode inside mapInPandas.
    Schema comes from ``avro_schema`` if given, else from one file's header
    read driver-side (local paths only — pass the schema explicitly for
    object-store paths). ``reader_schema`` turns on per-file schema
    RESOLUTION: every file decodes under its own embedded writer schema
    and resolves into the reader's shape, so a directory mixing schema
    versions (the normal state of a long-lived CDC topic archive) reads
    uniformly."""
    if reader_schema is None:
        try:
            return spark.read.format("avro").load(path)
        except Exception:
            pass  # jar absent (or incompatible): distributed pure-Python path

    if avro_schema is None:
        local = path[7:] if path.startswith("file://") else path
        candidates = (
            sorted(
                os.path.join(local, f)
                for f in os.listdir(local)
                if f.endswith(".avro")
            )
            if os.path.isdir(local)
            else [local]
        )
        if not candidates:
            raise ValueError(f"no .avro files under {path}")
        with open(candidates[0], "rb") as f:
            schema, _, _, _ = read_ocf_header(f.read(1 << 20))
    else:
        schema = parse_schema(avro_schema)
    rschema = parse_schema(reader_schema) if reader_schema is not None else None
    spark_schema = avro_to_spark_schema(rschema if rschema is not None else schema)
    names = [f.name for f in spark_schema.fields]

    def decode(iterator):
        import pandas as pd

        for pdf in iterator:
            for content in pdf["content"]:
                rows = []
                for rec in read_ocf(bytes(content), reader_schema=rschema):
                    rows.append(rec)
                    if len(rows) >= batch_rows:
                        yield pd.DataFrame(rows, columns=names)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(decode, spark_schema)
