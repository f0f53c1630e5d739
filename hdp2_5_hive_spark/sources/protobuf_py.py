"""ProtoBuf row SerDe — proto2 wire-format codec written from the
public encoding spec (https://protobuf.dev/programming-guides/
encoding/). Reference surface: Hive ships a PROTOCOL_BUFFERS
ObjectInspector over generated message classes
(``serde/src/java/org/apache/hadoop/hive/serde2/objectinspector/
ObjectInspectorFactory.java`` option ``PROTOCOL_BUFFERS``, exercised
by ``serde/src/test/.../TestProtocolBuffersObjectInspectors.java``
over the ``Complexpb.Complex`` fixture) and stores ORC footer
metadata as protobuf (``ql/src/protobuf/.../orc_proto.proto``).
This module is the row-bytes <-> typed-values half (the SerDe);
schema compilation / RPC is protoc's job and stays out of scope.

Wire format implemented from scratch (no protobuf library):

- field key = varint ``(field_number << 3) | wire_type``;
- wire types: 0 VARINT (bool/int32/int64/sint*), 1 I64 (double/
  fixed64), 2 LEN (string/bytes/nested message/packed repeated),
  5 I32 (float/fixed32);
- varint: base-128 little-endian groups, MSB = continuation;
  negative int32/int64 encode as the 10-byte two's-complement
  varint (proto2 rule); sint32/sint64 use ZigZag
  ``(n << 1) ^ (n >> 63)`` so small negatives stay small;
- repeated scalars: numeric fields WRITE packed (one LEN record,
  concatenated payloads — the ``[packed=true]`` layout every
  serious proto2 schema uses and proto3's default); the decoder
  accepts packed AND unpacked and concatenates mixed occurrences,
  per spec ("parsers must accept both forms");
- nested message / map: LEN-delimited; a protobuf map field is
  sugar for ``repeated message { key = 1; value = 2 }`` — encoded
  exactly so (sorted keys for byte-reproducible files);
- absent optional field = NULL (decode); NULL values are omitted
  (encode) — protobuf's presence convention, same as the thrift
  SerDe's;
- duplicate occurrences of a non-repeated field: LAST ONE WINS
  (spec rule for merged/concatenated messages);
- unknown field numbers are skipped by wire type (forward
  compatibility — old readers over new writers), exercised in
  tests.

Column types use the same Hive-ish strings as
``sources/thrift_py.py`` — ``boolean smallint int bigint float
double string binary`` plus the proto-specific ``sint32 sint64
fixed32 fixed64``, ``array<T>``, ``map<K,V>`` and
``struct<name:type,...>`` (positional field ids, id 1 = first
column — the PROTOCOL_BUFFERS ObjectInspector's field order).
"""

from __future__ import annotations

import struct

from .thrift_py import _split_struct_fields  # shared depth-aware type parser

W_VARINT = 0
W_I64 = 1
W_LEN = 2
W_I32 = 5

# scalar type -> wire type
_WIRE = {
    "boolean": W_VARINT,
    "smallint": W_VARINT,
    "int": W_VARINT,
    "bigint": W_VARINT,
    "sint32": W_VARINT,
    "sint64": W_VARINT,
    "fixed32": W_I32,
    "float": W_I32,
    "fixed64": W_I64,
    "double": W_I64,
    "string": W_LEN,
    "binary": W_LEN,
}

_MASK64 = (1 << 64) - 1



def _varint(n: int) -> bytes:
    """Unsigned base-128 varint (n must already be in [0, 2^64)."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        if pos >= len(buf):
            raise ValueError("protobuf: truncated stream (varint)")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint longer than 10 bytes")


def _zigzag(n: int) -> int:
    return ((n << 1) ^ (n >> 63)) & _MASK64


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _key(fid: int, wt: int) -> bytes:
    return _varint((fid << 3) | wt)


def _enc_scalar(t: str, v) -> bytes:
    """Payload bytes for one scalar value (no field key)."""
    if t == "boolean":
        return _varint(1 if v else 0)
    if t in ("smallint", "int", "bigint"):
        # negative int32/int64 -> 10-byte two's-complement varint
        return _varint(int(v) & _MASK64)
    if t in ("sint32", "sint64"):
        return _varint(_zigzag(int(v)))
    if t == "fixed32":
        return struct.pack("<I", v & 0xFFFFFFFF)
    if t == "fixed64":
        return struct.pack("<Q", v & _MASK64)
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "string":
        b = v.encode("utf-8")
        return _varint(len(b)) + b
    if t == "binary":
        b = bytes(v)
        return _varint(len(b)) + b
    raise NotImplementedError(f"protobuf scalar type {t!r}")



def _enc_field(fid: int, t: str, v) -> bytes:
    """Field key + payload for one (possibly composite) column."""
    if v is None:
        return b""
    if t.startswith("array<"):
        elem = t[6:-1].strip()
        if elem.startswith(("struct<", "map<", "array<")) or _WIRE[
            elem
        ] == W_LEN:
            # LEN elements can't pack — one tagged record each
            return b"".join(_enc_field(fid, elem, e) for e in v)
        # numeric/bool: packed — single LEN record of payloads
        body = b"".join(_enc_scalar(elem, e) for e in v)
        return _key(fid, W_LEN) + _varint(len(body)) + body
    if t.startswith("map<"):
        kt, vt = (s.strip() for s in t[4:-1].split(",", 1))
        out = bytearray()
        for k in sorted(v):
            entry = _enc_field(1, kt, k) + _enc_field(2, vt, v[k])
            out += _key(fid, W_LEN) + _varint(len(entry)) + entry
        return bytes(out)
    if t.startswith("struct<"):
        fields = _split_struct_fields(t)
        if isinstance(v, dict):
            vals = [v.get(n) for n, _ in fields]
        elif hasattr(v, "__fields__"):  # pyspark Row
            vals = [v[n] for n, _ in fields]
        else:
            vals = list(v)
        body = encode_row([ft for _, ft in fields], vals)
        return _key(fid, W_LEN) + _varint(len(body)) + body
    return _key(fid, _WIRE[t]) + _enc_scalar(t, v)


def encode_row(types: list[str], values: list) -> bytes:
    """Serialize one row as a proto2 message; field id i+1 = column
    i. NULL columns are omitted (absent field = null)."""
    return b"".join(
        _enc_field(i, t, v)
        for i, (t, v) in enumerate(zip(types, values), start=1)
    )


def _take_len(buf: bytes, pos: int) -> tuple[int, int]:
    """Read a LEN-prefix varint and bounds-check the declared payload
    against the remaining buffer — a truncated LEN field must raise
    (not silently clamp to the bytes present)."""
    n, pos = _read_varint(buf, pos)
    if pos + n > len(buf):
        raise ValueError(
            f"protobuf: truncated stream (LEN payload declares {n} "
            f"bytes, {len(buf) - pos} left)"
        )
    return n, pos


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise ValueError("protobuf: truncated stream (fixed-width field)")


def _dec_scalar(t: str, buf: bytes, pos: int):
    if t == "boolean":
        n, pos = _read_varint(buf, pos)
        return n != 0, pos
    if t in ("smallint", "int"):
        n, pos = _read_varint(buf, pos)
        n &= 0xFFFFFFFF  # int32 truncation of the 64-bit varint
        return n - (1 << 32) if n >= 1 << 31 else n, pos
    if t == "bigint":
        n, pos = _read_varint(buf, pos)
        return n - (1 << 64) if n >= 1 << 63 else n, pos
    if t in ("sint32", "sint64"):
        n, pos = _read_varint(buf, pos)
        return _unzigzag(n), pos
    if t == "fixed32":
        _need(buf, pos, 4)
        return struct.unpack_from("<I", buf, pos)[0], pos + 4
    if t == "fixed64":
        _need(buf, pos, 8)
        return struct.unpack_from("<Q", buf, pos)[0], pos + 8
    if t == "float":
        _need(buf, pos, 4)
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        _need(buf, pos, 8)
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = _take_len(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "binary":
        n, pos = _take_len(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    raise NotImplementedError(f"protobuf scalar type {t!r}")


def _skip(wt: int, buf: bytes, pos: int) -> int:
    """Skip an unknown field's payload by wire type (forward
    compatibility: old schema reading a newer writer's bytes)."""
    if wt == W_VARINT:
        return _read_varint(buf, pos)[1]
    if wt == W_I64:
        _need(buf, pos, 8)
        return pos + 8
    if wt == W_I32:
        _need(buf, pos, 4)
        return pos + 4
    if wt == W_LEN:
        n, pos = _take_len(buf, pos)
        return pos + n
    raise ValueError(f"unsupported wire type {wt}")


def _dec_len_field(t: str, payload: bytes):
    """Interpret one LEN payload for a composite column type."""
    if t.startswith("struct<"):
        fields = _split_struct_fields(t)
        return decode_row([ft for _, ft in fields], payload)
    if t.startswith("map<"):
        kt, vt = (s.strip() for s in t[4:-1].split(",", 1))
        entry = decode_row([kt, vt], payload)
        return (entry[0], entry[1])  # one (k, v) map entry
    raise NotImplementedError(f"LEN composite {t!r}")


def decode_row(types: list[str], payload: bytes) -> list:
    """Deserialize one message into a positional row matching
    ``types`` (absent fields decode as None; repeated fields as
    lists; maps as dicts). Unknown field numbers are skipped."""
    n_cols = len(types)
    row: list = [None] * n_cols
    pos = 0
    while pos < len(payload):
        key, pos = _read_varint(payload, pos)
        fid, wt = key >> 3, key & 7
        if not 1 <= fid <= n_cols:
            pos = _skip(wt, payload, pos)
            continue
        t = types[fid - 1]
        if t.startswith("array<"):
            elem = t[6:-1].strip()
            if row[fid - 1] is None:
                row[fid - 1] = []
            if elem.startswith(("struct<", "map<", "array<")):
                n, pos = _take_len(payload, pos)
                row[fid - 1].append(
                    _dec_len_field(elem, payload[pos : pos + n])
                )
                pos += n
            elif wt == W_LEN and _WIRE[elem] != W_LEN:
                # packed: one LEN record, concatenated payloads
                n, pos = _take_len(payload, pos)
                end = pos + n
                while pos < end:
                    v, pos = _dec_scalar(elem, payload, pos)
                    row[fid - 1].append(v)
            else:
                v, pos = _dec_scalar(elem, payload, pos)
                row[fid - 1].append(v)
        elif t.startswith("map<"):
            n, pos = _take_len(payload, pos)
            k, v = _dec_len_field(t, payload[pos : pos + n])
            pos += n
            if row[fid - 1] is None:
                row[fid - 1] = {}
            row[fid - 1][k] = v  # later entry wins, per spec
        elif t.startswith("struct<"):
            n, pos = _take_len(payload, pos)
            row[fid - 1] = _dec_len_field(t, payload[pos : pos + n])
            pos += n
        else:
            # non-repeated scalar: last one wins, per spec
            row[fid - 1], pos = _dec_scalar(t, payload, pos)
    return row
