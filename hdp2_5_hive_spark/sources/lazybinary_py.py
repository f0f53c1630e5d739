"""LazyBinary row SerDe — Hive's compact binary row format
(reference ``serde/src/java/org/apache/hadoop/hive/serde2/
lazybinary/LazyBinarySerDe.java``; layout re-implemented from the
public Hive source, no code copied).

LazyBinary is what Hive uses for INTERMEDIATE tables
(``hive.query.result.fileformat``/SequenceFile value bytes) and any
``STORED AS ... 'LazyBinarySerDe'`` table — the third row-codec of
the §2.2 connector family beside Thrift (thrift_py) and ProtoBuf
(protobuf_py). Wire layout (LazyBinarySerDe.java:255-640):

- struct/row: per 8 fields ONE null byte (bit ``i % 8`` set = field
  i NOT null), followed by those 8 fields' payloads (nulls
  contribute no bytes); the top-level row has NO length prefix,
  nested struct/list/map payloads are preceded by a 4-byte
  big-endian byte-size (written back into reserved space —
  writeSizeAtOffset);
- primitives: boolean 1 byte; tinyint 1; smallint 2 BE; int/bigint
  Hadoop zero-compressed vint/vlong (the SAME encoding RCFile keys
  use — shared with sources/rcfile_py); float/double IEEE-754 BE;
  string/binary = vint length + bytes; decimal = vint scale + vint
  unscaled-length + two's-complement big-endian unscaled bytes
  (HiveDecimalWritable.writeToByteStream);
- list: [4-byte size][vint count][null bytes per 8 elems][elems];
- map: [4-byte size][vint count][null bytes per 8 SLOTS — key and
  value each take a bit][k1 v1 k2 v2 ...].

Decode is schema-driven (LazyBinary is not self-describing — the
reader must know the column types, exactly like Hive's
LazyBinaryStruct walks the ObjectInspector). Hive-compat note:
HiveDecimal strips trailing zeros before writing; this codec writes
the value's declared scale and reads back whatever scale is present,
so files written by real Hive decode correctly while round-trips
through this codec are exact.
"""

from __future__ import annotations

import io
import struct
from decimal import Decimal

from .rcfile_py import read_vlong, write_vlong
from .thrift_py import _split_struct_fields

__all__ = ["encode_row", "decode_row"]


def _split_two(inner: str) -> tuple[str, str]:
    """Split 'K,V' at angle-depth 0 (map type arguments)."""
    depth = 0
    for i, ch in enumerate(inner):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            return inner[:i].strip(), inner[i + 1 :].strip()
    raise ValueError(f"bad map type arguments: {inner!r}")


def _vint_bytes(i: int) -> bytes:
    buf = io.BytesIO()
    write_vlong(buf, i)
    return buf.getvalue()


def _encode_value(t: str, v) -> bytes:
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "tinyint":
        return struct.pack(">b", v)
    if t == "smallint":
        return struct.pack(">h", v)
    if t in ("int", "bigint"):
        return _vint_bytes(int(v))
    if t == "float":
        return struct.pack(">f", v)
    if t == "double":
        return struct.pack(">d", v)
    if t == "string":
        raw = v.encode("utf-8")
        return _vint_bytes(len(raw)) + raw
    if t == "binary":
        raw = bytes(v)
        return _vint_bytes(len(raw)) + raw
    if t.startswith("decimal"):
        d = Decimal(v)
        exp = d.as_tuple().exponent
        scale = -exp if exp < 0 else 0
        unscaled = int(d.scaleb(scale))
        # minimal two's-complement width — BigInteger.toByteArray
        # semantics (bitLength excludes the sign bit), so bytes match
        # HiveDecimalWritable exactly (e.g. -128 -> one byte 0x80)
        bl = (
            (-unscaled - 1).bit_length()
            if unscaled < 0
            else unscaled.bit_length()
        )
        raw = unscaled.to_bytes(bl // 8 + 1, "big", signed=True)
        return _vint_bytes(scale) + _vint_bytes(len(raw)) + raw
    if t.startswith("array<"):
        elem = t[6:-1].strip()
        body = bytearray(_vint_bytes(len(v)))
        body += _null_bytes([e is not None for e in v])
        for e in v:
            if e is not None:
                body += _encode_value(elem, e)
        return struct.pack(">i", len(body)) + bytes(body)
    if t.startswith("map<"):
        kt, vt = _split_two(t[4:-1])
        items = sorted(v.items())  # byte-reproducible files
        body = bytearray(_vint_bytes(len(items)))
        slots: list[bool] = []
        for k, val in items:
            slots.append(k is not None)
            slots.append(val is not None)
        body += _null_bytes(slots)
        for k, val in items:
            if k is not None:
                body += _encode_value(kt, k)
            if val is not None:
                body += _encode_value(vt, val)
        return struct.pack(">i", len(body)) + bytes(body)
    if t.startswith("struct<"):
        fields = _split_struct_fields(t)
        if isinstance(v, dict):
            vals = [v.get(n) for n, _ in fields]
        elif hasattr(v, "__fields__"):
            vals = [v[n] for n, _ in fields]
        else:
            vals = list(v)
        body = _encode_fields([ft for _, ft in fields], vals)
        return struct.pack(">i", len(body)) + body
    raise NotImplementedError(f"lazybinary: unsupported type {t!r}")


def _null_bytes(present: list[bool]) -> bytes:
    """The per-8-slots null bytes (LazyBinarySerDe.java:265-283)."""
    out = bytearray()
    b = 0
    for i, p in enumerate(present):
        if p:
            b |= 1 << (i % 8)
        if i % 8 == 7 or i == len(present) - 1:
            out.append(b)
            b = 0
    return bytes(out)


def _encode_fields(types: list[str], values: list) -> bytes:
    """Struct body: null byte per 8 fields, then those fields'
    payloads — the exact interleaving of serializeStruct."""
    out = bytearray()
    group_start = 0
    b = 0
    for i, (t, v) in enumerate(zip(types, values)):
        if v is not None:
            b |= 1 << (i % 8)
        if i % 8 == 7 or i == len(types) - 1:
            out.append(b)
            for j in range(group_start, i + 1):
                if values[j] is not None:
                    out += _encode_value(types[j], values[j])
            group_start = i + 1
            b = 0
    return bytes(out)


def encode_row(types: list[str], values: list) -> bytes:
    """Serialize one row (top-level struct — no length prefix)."""
    if len(types) != len(values):
        raise ValueError("types/values length mismatch")
    return _encode_fields(types, values)


class _Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def take(self, n: int) -> bytes:
        raw = self.data[self.pos : self.pos + n]
        if len(raw) != n:
            raise EOFError("lazybinary: truncated payload")
        self.pos += n
        return raw

    def vlong(self) -> int:
        src = io.BytesIO(self.data[self.pos : self.pos + 9])
        v = read_vlong(src)
        self.pos += src.tell()
        return v


def _decode_value(t: str, r: _Reader):
    if t == "boolean":
        return r.take(1) != b"\x00"
    if t == "tinyint":
        return struct.unpack(">b", r.take(1))[0]
    if t == "smallint":
        return struct.unpack(">h", r.take(2))[0]
    if t in ("int", "bigint"):
        return r.vlong()
    if t == "float":
        return struct.unpack(">f", r.take(4))[0]
    if t == "double":
        return struct.unpack(">d", r.take(8))[0]
    if t == "string":
        return r.take(r.vlong()).decode("utf-8")
    if t == "binary":
        return r.take(r.vlong())
    if t.startswith("decimal"):
        scale = r.vlong()
        raw = r.take(r.vlong())
        unscaled = int.from_bytes(raw, "big", signed=True)
        return Decimal(unscaled).scaleb(-scale)
    if t.startswith("array<"):
        elem = t[6:-1].strip()
        struct.unpack(">i", r.take(4))  # byte size (skippable span)
        n = r.vlong()
        present = _read_null_bits(r, n)
        return [
            _decode_value(elem, r) if present[i] else None
            for i in range(n)
        ]
    if t.startswith("map<"):
        kt, vt = _split_two(t[4:-1])
        struct.unpack(">i", r.take(4))
        n = r.vlong()
        present = _read_null_bits(r, 2 * n)
        out = {}
        for i in range(n):
            k = _decode_value(kt, r) if present[2 * i] else None
            v = _decode_value(vt, r) if present[2 * i + 1] else None
            out[k] = v
        return out
    if t.startswith("struct<"):
        fields = _split_struct_fields(t)
        struct.unpack(">i", r.take(4))
        vals = _decode_fields([ft for _, ft in fields], r)
        return dict(zip([n for n, _ in fields], vals))
    raise NotImplementedError(f"lazybinary: unsupported type {t!r}")


def _read_null_bits(r: _Reader, n_slots: int) -> list[bool]:
    bits: list[bool] = []
    for g in range((n_slots + 7) // 8):
        b = r.take(1)[0]
        for j in range(min(8, n_slots - 8 * g)):
            bits.append(bool(b & (1 << j)))
    return bits


def _decode_fields(types: list[str], r: _Reader) -> list:
    vals: list = [None] * len(types)
    i = 0
    while i < len(types):
        group = min(8, len(types) - i)
        b = r.take(1)[0]
        for j in range(group):
            if b & (1 << j):
                vals[i + j] = _decode_value(types[i + j], r)
        i += group
    return vals


def decode_row(types: list[str], data: bytes) -> list:
    """Deserialize one row; returns positional values (None where
    the null bit was clear)."""
    return _decode_fields(types, _Reader(data))
