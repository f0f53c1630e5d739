"""Binary-sortable row encoding — order-preserving bytes (reference
``serde/src/java/org/apache/hadoop/hive/serde2/binarysortable/
BinarySortableSerDe.java``): unsigned BYTE comparison of two encoded
rows equals typed row comparison. Hive uses it for shuffle/sort keys
(ReduceSinkOperator key SerDe); here it backs utilities that need a
single sortable byte key over mixed-type tuples (range-partitioned
layouts, composite sort keys in files Spark's tuple sort can't see).

Encoding per column (ascending order, NULLs FIRST — Hive default):

- null marker: ``0x00`` for NULL (sorts before everything), ``0x01``
  then the payload otherwise;
- long/int: big-endian with the SIGN BIT FLIPPED (two's-complement
  order becomes unsigned byte order);
- double: IEEE-754 bits; positive values flip the sign bit, negative
  values flip ALL bits (the classic total-order trick);
- boolean: 1 for false, 2 for true;
- string/bytes: UTF-8 with ``0x00``→``0x01 0x01`` and
  ``0x01``→``0x01 0x02`` escapes, ``0x00`` terminator — the
  terminator sorts below any content byte so prefixes sort first.

Pinned by property tests (tests/test_binsort.py): for random typed
rows, sorting by encoded bytes IS sorting by SQL tuple order.
"""

from __future__ import annotations

import struct


def _enc_long(v: int, width: int = 8) -> bytes:
    b = bytearray(v.to_bytes(width, "big", signed=True))
    b[0] ^= 0x80
    return bytes(b)


def _enc_double(v: float) -> bytes:
    if v == 0.0:
        # -0.0 and +0.0 compare equal in SQL but carry different IEEE
        # bits; encoding them differently breaks byte-order == tuple
        # order (a -0.0 key sorted below a +0.0 key while the typed
        # comparison called them a tie, letting a LATER column decide).
        v = 0.0
    bits = struct.unpack(">Q", struct.pack(">d", v))[0]
    if bits & (1 << 63):
        bits ^= 0xFFFFFFFFFFFFFFFF  # negative: flip all
    else:
        bits ^= 1 << 63  # positive: flip sign
    return struct.pack(">Q", bits)


def _enc_string(v: str | bytes) -> bytes:
    raw = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    out = bytearray()
    for byte in raw:
        if byte <= 1:
            out += bytes((1, byte + 1))
        else:
            out.append(byte)
    out.append(0)
    return bytes(out)


def encode_key(types: list[str], values: list) -> bytes:
    """Encode one row as an order-preserving byte key."""
    out = bytearray()
    for t, v in zip(types, values):
        if v is None:
            out.append(0)
            continue
        out.append(1)
        if t == "bigint":
            out += _enc_long(int(v), 8)
        elif t == "int":
            out += _enc_long(int(v), 4)
        elif t == "double":
            out += _enc_double(float(v))
        elif t == "boolean":
            out.append(2 if v else 1)
        elif t in ("string", "binary"):
            out += _enc_string(v)
        else:
            raise NotImplementedError(f"binary-sortable type {t!r}")
    return bytes(out)


def decode_key(types: list[str], payload: bytes) -> list:
    """Inverse of encode_key (round-trip support for tests/tools).
    Truncated or corrupt keys raise ValueError (round-12 corrupt-input
    contract) — a bare index/unpack past the buffer end leaked
    IndexError/struct.error before."""

    def take(pos: int, n: int) -> bytes:
        if pos + n > len(payload):
            raise ValueError("binsort: truncated key")
        return payload[pos : pos + n]

    row, pos = [], 0
    for t in types:
        marker = take(pos, 1)[0]
        pos += 1
        if marker == 0:
            row.append(None)
            continue
        if t in ("bigint", "int"):
            width = 8 if t == "bigint" else 4
            b = bytearray(take(pos, width))
            b[0] ^= 0x80
            row.append(int.from_bytes(bytes(b), "big", signed=True))
            pos += width
        elif t == "double":
            (bits,) = struct.unpack(">Q", take(pos, 8))
            if bits & (1 << 63):
                bits ^= 1 << 63
            else:
                bits ^= 0xFFFFFFFFFFFFFFFF
            row.append(struct.unpack(">d", struct.pack(">Q", bits))[0])
            pos += 8
        elif t == "boolean":
            row.append(take(pos, 1)[0] == 2)
            pos += 1
        elif t in ("string", "binary"):
            raw = bytearray()
            while True:
                byte = take(pos, 1)[0]
                pos += 1
                if byte == 0:
                    break
                if byte == 1:
                    esc = take(pos, 1)[0]
                    pos += 1
                    if esc not in (1, 2):
                        raise ValueError(
                            f"binsort: invalid escape byte {esc}"
                        )
                    raw.append(esc - 1)
                else:
                    raw.append(byte)
            row.append(raw.decode("utf-8") if t == "string" else bytes(raw))
        else:
            raise NotImplementedError(t)
    return row
