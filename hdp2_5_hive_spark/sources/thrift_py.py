"""Thrift row SerDe — TBinaryProtocol struct codec (reference
``serde/src/java/org/apache/hadoop/hive/serde2/thrift/
ThriftDeserializer.java`` + ``ThriftByteStreamTypedSerDe``; wire
format from the public Apache Thrift spec,
https://github.com/apache/thrift/blob/master/doc/specs/
thrift-binary-protocol.md).

A classic HDP-era table layout is thrift-serialized structs stored as
the values of a SequenceFile — this module decodes (and, for
round-trip fixtures, encodes) that row format from scratch:

- struct = repeated fields ``[type:i8][field-id:i16 BE][payload]``
  terminated by T_STOP (0x00);
- payloads: BOOL 1 byte, I16/I32/I64 big-endian, DOUBLE IEEE-754 BE,
  STRING/BINARY ``len:i32 BE`` + bytes; LIST ``[elem-type:i8]
  [count:i32 BE]`` + elements; MAP ``[key-type:i8][val-type:i8]
  [count:i32 BE]`` + alternating key/value payloads (keys written
  sorted for byte-reproducible files); nested STRUCT nests the field
  layout uniformly (fields then T_STOP) — the full shape of the
  reference's ``src_thrift`` Complex fixture (lists, maps, nested
  structs). Decode is schema-less: positional by field id, absent
  fields = None.

Scope note: this is the SerDe (row bytes <-> typed values), the
piece Hive's ThriftDeserializer provides; transport/RPC is the
actual Thrift library's job and stays out of scope. Field ids map
positionally to columns (id 1 = first column), Hive's default for
ThriftByteStreamTypedSerDe.
"""

from __future__ import annotations

import struct

T_STOP = 0
T_BOOL = 2
T_BYTE = 3
T_DOUBLE = 4
T_I16 = 6
T_I32 = 8
T_I64 = 10
T_STRING = 11
T_STRUCT = 12
T_MAP = 13
T_LIST = 15

_TYPE_FOR = {
    "boolean": T_BOOL,
    "smallint": T_I16,
    "int": T_I32,
    "bigint": T_I64,
    "double": T_DOUBLE,
    "string": T_STRING,
}


def encode_row(types: list[str], values: list) -> bytes:
    """Serialize one row; NULL columns are simply omitted (thrift's
    optional-field convention — absent id = null)."""
    out = bytearray()
    for idx, (t, v) in enumerate(zip(types, values), start=1):
        if v is None:
            continue
        if t.startswith("array<"):
            elem = t[6:-1]
            et = _TYPE_FOR[elem]
            out += struct.pack(">bh", T_LIST, idx)
            out += struct.pack(">bi", et, len(v))
            for e in v:
                out += _encode_value(et, e)
            continue
        if t.startswith("struct<"):
            out += struct.pack(">bh", T_STRUCT, idx)
            out += _encode_struct(t, v)
            continue
        if t.startswith("map<"):
            kt_s, vt_s = t[4:-1].split(",", 1)
            kt, vt = _TYPE_FOR[kt_s.strip()], _TYPE_FOR[vt_s.strip()]
            out += struct.pack(">bh", T_MAP, idx)
            # TBinaryProtocol map header: key type, value type, size
            out += struct.pack(">bbi", kt, vt, len(v))
            # deterministic serialization: sorted keys (thrift maps
            # are unordered; sorting makes files byte-reproducible)
            for k in sorted(v):
                out += _encode_value(kt, k)
                out += _encode_value(vt, v[k])
            continue
        tt = _TYPE_FOR[t]
        out += struct.pack(">bh", tt, idx)
        out += _encode_value(tt, v)
    out += struct.pack(">b", T_STOP)
    return bytes(out)


def _split_struct_fields(t: str) -> list[tuple[str, str]]:
    """Parse "struct<a:int,b:string,c:array<int>>" into
    [(name, type), ...] — commas split only at angle-depth 0."""
    inner = t[7:-1]
    fields, depth, start = [], 0, 0
    for i, ch in enumerate(inner + ","):
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            name, ft = inner[start:i].split(":", 1)
            fields.append((name.strip(), ft.strip()))
            start = i + 1
    return fields


def _encode_struct(t: str, v) -> bytes:
    """Nested struct (wire type 12): its fields 1..k, then T_STOP —
    the same layout as the top-level row (TBinaryProtocol structs
    nest uniformly). ``v`` may be a dict (by name), a Row, or a
    positional sequence."""
    fields = _split_struct_fields(t)
    if isinstance(v, dict):
        vals = [v.get(n) for n, _ in fields]
    elif hasattr(v, "__fields__"):  # pyspark Row
        vals = [v[n] for n, _ in fields]
    else:
        vals = list(v)
    return encode_row([ft for _, ft in fields], vals)


def _encode_value(tt: int, v) -> bytes:
    if tt == T_BOOL:
        return struct.pack(">b", 1 if v else 0)
    if tt == T_I16:
        return struct.pack(">h", v)
    if tt == T_I32:
        return struct.pack(">i", v)
    if tt == T_I64:
        return struct.pack(">q", v)
    if tt == T_DOUBLE:
        return struct.pack(">d", v)
    if tt == T_STRING:
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
        return struct.pack(">i", len(b)) + b
    raise NotImplementedError(f"thrift type {tt}")


def _unpack(fmt: str, payload: bytes, pos: int):
    # bounds-checked unpack: truncated payloads raised bare
    # struct.error (round-12 corrupt-input contract wants ValueError)
    try:
        return struct.unpack_from(fmt, payload, pos)
    except struct.error as exc:
        raise ValueError(
            f"thrift_py: truncated payload at offset {pos}"
        ) from exc


def decode_row(payload: bytes, n_cols: int) -> list:
    """Deserialize one struct into a positional row of ``n_cols``
    (absent field ids decode as None)."""
    row = [None] * n_cols
    pos = 0
    while True:
        (tt,) = _unpack(">b", payload, pos)
        pos += 1
        if tt == T_STOP:
            break
        (fid,) = _unpack(">h", payload, pos)
        pos += 2
        val, pos = _decode_value(tt, payload, pos)
        if not 1 <= fid <= n_cols:
            raise ValueError(f"field id {fid} outside 1..{n_cols}")
        row[fid - 1] = val
    return row


# Nesting cap for the recursive container decoder: a corrupt (or
# crafted) payload of a few KB of nested list/struct/map headers
# otherwise raises RecursionError — an internal error class the
# corrupt-input contract forbids (ValueError only).
MAX_NEST_DEPTH = 64


def _decode_value(tt: int, payload: bytes, pos: int, depth: int = 0):
    if depth > MAX_NEST_DEPTH:
        raise ValueError(
            f"thrift_py: nesting deeper than {MAX_NEST_DEPTH} at "
            f"offset {pos}"
        )
    if tt == T_BOOL:
        if pos >= len(payload):
            raise ValueError(
                f"thrift_py: truncated payload at offset {pos}"
            )
        return payload[pos] != 0, pos + 1
    if tt == T_BYTE:
        return _unpack(">b", payload, pos)[0], pos + 1
    if tt == T_I16:
        return _unpack(">h", payload, pos)[0], pos + 2
    if tt == T_I32:
        return _unpack(">i", payload, pos)[0], pos + 4
    if tt == T_I64:
        return _unpack(">q", payload, pos)[0], pos + 8
    if tt == T_DOUBLE:
        return _unpack(">d", payload, pos)[0], pos + 8
    if tt == T_STRING:
        (n,) = _unpack(">i", payload, pos)
        pos += 4
        # a corrupt length must fail loudly: n < 0 REWINDS the cursor
        # (payload[pos:pos+n] is b'' and pos+n moves backwards, so
        # already-consumed bytes re-parse as field headers — a
        # garbage row with no error); n past the end silently clamps
        # and shifts the error to an opaque struct.error later
        if n < 0 or pos + n > len(payload):
            raise ValueError(
                f"thrift_py: bad string length {n} at offset {pos - 4}"
            )
        return payload[pos : pos + n].decode("utf-8"), pos + n
    if tt == T_LIST:
        et, = _unpack(">b", payload, pos)
        (n,) = _unpack(">i", payload, pos + 1)
        pos += 5
        if n < 0:
            raise ValueError(f"thrift_py: negative list size {n}")
        out = []
        for _ in range(n):
            v, pos = _decode_value(et, payload, pos, depth + 1)
            out.append(v)
        return out, pos
    if tt == T_STRUCT:
        vals: dict[int, object] = {}
        while True:
            (ft,) = _unpack(">b", payload, pos)
            pos += 1
            if ft == T_STOP:
                break
            (fid,) = _unpack(">h", payload, pos)
            pos += 2
            v, pos = _decode_value(ft, payload, pos, depth + 1)
            vals[fid] = v
        n = max(vals) if vals else 0
        return [vals.get(i) for i in range(1, n + 1)], pos
    if tt == T_MAP:
        kt, vt = _unpack(">bb", payload, pos)
        (n,) = _unpack(">i", payload, pos + 2)
        pos += 6
        if n < 0:
            # range(n) over a corrupt negative count silently decoded
            # an EMPTY map with no error (same class as the
            # typedbytes negative-vector fix)
            raise ValueError(f"thrift_py: negative map size {n}")
        m = {}
        for _ in range(n):
            k, pos = _decode_value(kt, payload, pos, depth + 1)
            v, pos = _decode_value(vt, payload, pos, depth + 1)
            m[k] = v
        return m, pos
    raise NotImplementedError(
        f"thrift wire type {tt} (nested struct/map out of scope)"
    )
