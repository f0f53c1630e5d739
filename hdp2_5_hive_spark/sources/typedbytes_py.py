"""TypedBytes codec — the Hadoop-streaming binary TRANSFORM wire
format (reference ``contrib/.../util/typedbytes/Type.java`` +
``TypedBytesOutput/Input.java`` + ``serde2/TypedBytesSerDe.java``;
format originally from HADOOP-1722 / Dumbo, public).

Hive's binary ScriptOperator path: with
``hive.script.recordwriter/recordreader = TypedBytesRecord*``, a
TRANSFORM script receives rows as SELF-DESCRIBING typed values on
stdin instead of tab-separated text — the format every
Hadoop-streaming ecosystem tool (Dumbo, ctypedbytes) speaks. Layout:
one byte type code then a big-endian payload:

  BYTES=0   int32 length + raw bytes         (Hive ``binary``)
  BYTE=1    1 byte                           (``tinyint``)
  BOOL=2    1 byte 0/1
  INT=3     int32 BE
  LONG=4    int64 BE                         (``bigint``)
  FLOAT=5   IEEE-754 float32 BE
  DOUBLE=6  IEEE-754 float64 BE
  STRING=7  int32 length + UTF-8 bytes
  VECTOR=8  int32 count + typed elements     (``array<T>``)
  LIST=9    typed elements until MARKER
  MAP=10    int32 count + typed k/v pairs    (``map<K,V>``)
  SHORT=11  int16 BE                         (``smallint``)
  NULL=12   no payload
  MARKER=255 (terminates LIST)

A row is simply the concatenation of its column values
(TypedBytesSerDe.serialize) — NULL columns write the NULL code, so
decode is schema-free: read values until the buffer ends.
"""

from __future__ import annotations

import struct

BYTES, BYTE, BOOL, INT, LONG = 0, 1, 2, 3, 4
FLOAT, DOUBLE, STRING, VECTOR, LIST, MAP = 5, 6, 7, 8, 9, 10
SHORT, NULL, MARKER = 11, 12, 255

__all__ = ["encode_value", "encode_row", "decode_row", "decode_stream"]


def encode_value(v) -> bytes:
    """One typed value, dispatched on the Python type (the
    TypedBytesOutput.write instanceof ladder). Ints pick the
    smallest of INT/LONG like Hadoop's Integer-vs-Long boxing."""
    if v is None:
        return bytes([NULL])
    if isinstance(v, bool):
        return bytes([BOOL, 1 if v else 0])
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return bytes([INT]) + struct.pack(">i", v)
        return bytes([LONG]) + struct.pack(">q", v)
    if isinstance(v, float):
        return bytes([DOUBLE]) + struct.pack(">d", v)
    if isinstance(v, str):
        raw = v.encode("utf-8")
        return bytes([STRING]) + struct.pack(">i", len(raw)) + raw
    if isinstance(v, (bytes, bytearray)):
        raw = bytes(v)
        return bytes([BYTES]) + struct.pack(">i", len(raw)) + raw
    if isinstance(v, (list, tuple)):
        out = bytes([VECTOR]) + struct.pack(">i", len(v))
        return out + b"".join(encode_value(e) for e in v)
    if isinstance(v, dict):
        out = bytes([MAP]) + struct.pack(">i", len(v))
        for k in sorted(v):  # byte-reproducible
            out += encode_value(k) + encode_value(v[k])
        return out
    raise NotImplementedError(f"typedbytes: unsupported {type(v)!r}")


def encode_row(values: list) -> bytes:
    """A row = its column values concatenated
    (TypedBytesSerDe.serialize)."""
    return b"".join(encode_value(v) for v in values)


# Nesting cap for the recursive container decoder: a corrupt payload
# of a few KB of VECTOR/LIST/MAP headers otherwise raises
# RecursionError — an internal error class the corrupt-input contract
# forbids (ValueError/EOFError only). Legit Hadoop typedbytes rows
# nest a handful of levels at most.
MAX_NEST_DEPTH = 64


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.depth = 0

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def take(self, n: int) -> bytes:
        raw = self.data[self.pos : self.pos + n]
        if len(raw) != n:
            raise EOFError("typedbytes: truncated")
        self.pos += n
        return raw

    def value(self):
        code = self.take(1)[0]
        if code in (VECTOR, LIST, MAP):
            self.depth += 1
            if self.depth > MAX_NEST_DEPTH:
                raise ValueError(
                    f"typedbytes: nesting deeper than {MAX_NEST_DEPTH} "
                    f"at offset {self.pos - 1}"
                )
            try:
                return self._container(code)
            finally:
                self.depth -= 1
        if code == NULL:
            return None
        if code == BOOL:
            return self.take(1) != b"\x00"
        if code == BYTE:
            return struct.unpack(">b", self.take(1))[0]
        if code == SHORT:
            return struct.unpack(">h", self.take(2))[0]
        if code == INT:
            return struct.unpack(">i", self.take(4))[0]
        if code == LONG:
            return struct.unpack(">q", self.take(8))[0]
        if code == FLOAT:
            return struct.unpack(">f", self.take(4))[0]
        if code == DOUBLE:
            return struct.unpack(">d", self.take(8))[0]
        if code == STRING:
            return self.take(struct.unpack(">i", self.take(4))[0]).decode(
                "utf-8"
            )
        if code == BYTES:
            return self.take(struct.unpack(">i", self.take(4))[0])
        raise NotImplementedError(f"typedbytes: code {code}")

    def _container(self, code: int):
        if code == VECTOR:
            n = struct.unpack(">i", self.take(4))[0]
            if n < 0:
                # range(negative) is silently empty — the vector's
                # element bytes would re-parse as the NEXT columns'
                # type codes, a garbage row with no error
                raise ValueError(f"typedbytes: negative vector size {n}")
            return [self.value() for _ in range(n)]
        if code == LIST:
            out = []
            while True:
                if self.pos >= len(self.data):
                    raise EOFError(
                        "typedbytes: truncated (unterminated list)"
                    )
                if self.data[self.pos] == MARKER:
                    break
                out.append(self.value())
            self.pos += 1
            return out
        n = struct.unpack(">i", self.take(4))[0]  # MAP
        if n < 0:
            raise ValueError(f"typedbytes: negative map size {n}")
        return {self.value(): self.value() for _ in range(n)}


def decode_row(data: bytes, n_cols: int) -> list:
    """First ``n_cols`` typed values of a row buffer."""
    r = _Reader(data)
    return [r.value() for _ in range(n_cols)]


def decode_stream(data: bytes, n_cols: int):
    """Split a concatenated stream of rows (the script's stdout in
    the TRANSFORM contract) back into rows of ``n_cols`` values."""
    r = _Reader(data)
    while not r.eof():
        yield [r.value() for _ in range(n_cols)]
