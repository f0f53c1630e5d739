"""Pure-Python Snappy — raw format + Hadoop SnappyCodec block framing.

Snappy was the other common compression default on HDP warehouses
(the RCFile header names the codec class —
``ql/io/RCFile.java:1137-1253`` stores it as a Hadoop Text and every
column buffer is an independent codec stream), but the container has
no snappy library for the from-scratch Python readers, so legacy
RCFile+Snappy migration reads raised with transcode guidance. This
module closes that gap from the PUBLIC format descriptions:

- **Raw Snappy** (google/snappy ``format_description.txt``): a
  little-endian varint preamble with the uncompressed length, then a
  tag stream — literals (tag low bits 00, length in the upper 6 bits
  or 1-4 trailing LE bytes for lengths >= 61) and back-references
  (01 = 1-byte offset extension: len 4-11, offset <= 2047;
  10 = 2-byte LE offset: len 1-64; 11 = 4-byte LE offset). Copies may
  overlap (offset < length replays the produced bytes). The encoder
  compresses in independent 64 KiB fragments like the reference
  implementation, with a 4-byte hash table and greedy matching.
- **Hadoop block framing** (``BlockCompressorStream`` /
  ``BlockDecompressorStream``, the layer SnappyCodec wraps around the
  raw codec): repeated ``[i32 BE uncompressed-block-length]`` then
  one or more ``[i32 BE compressed-chunk-length][raw-snappy chunk]``
  sub-blocks until the block's uncompressed length is produced;
  blocks default to 256 KiB (``io.compression.codec.snappy
  .buffersize``).

Correctness is pinned against an INDEPENDENT implementation: pyarrow
ships google snappy (``pa.Codec("snappy")``), and the tests
round-trip both directions against it plus hand-decoded wire
vectors.
"""

from __future__ import annotations

import struct

BLOCK_SIZE = 256 * 1024  # Hadoop io.compression.codec.snappy.buffersize
_FRAGMENT = 65536  # reference encoder compresses 64 KiB at a time


# ---------------------------------------------------------------------------
# raw format: decode
# ---------------------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated stream (varint preamble)")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: varint preamble too long")


def uncompress(data: bytes) -> bytes:
    """Decode one raw-snappy buffer (preamble + tag stream).
    Truncated or corrupt input raises ValueError (module convention —
    never a bare IndexError or a silently-shortened literal run)."""
    if not data:
        raise ValueError("snappy: empty input")
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63 -> 1..4 trailing LE length bytes
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError(
                        "snappy: truncated stream (literal length)"
                    )
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("snappy: truncated stream (literal run)")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset extension
            if pos >= n:
                raise ValueError("snappy: truncated stream (copy offset)")
            ln = 4 + ((tag >> 2) & 0x07)
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated stream (copy offset)")
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte LE offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated stream (copy offset)")
            ln = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(
                f"snappy: bad copy offset {offset} at output {len(out)}"
            )
        if offset >= ln:
            start = len(out) - offset
            out += out[start : start + ln]
        else:  # overlapping copy: replay bytes as they are produced
            start = len(out) - offset
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != expected:
        raise ValueError(
            f"snappy: produced {len(out)} bytes, preamble said {expected}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# raw format: encode (greedy 4-byte-hash matcher, 64 KiB fragments)
# ---------------------------------------------------------------------------


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    ln = end - start
    if ln <= 0:
        return
    n = ln - 1
    if n < 60:
        out.append(n << 2)
    elif n < 1 << 8:
        out.append(60 << 2)
        out.append(n)
    elif n < 1 << 16:
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    else:  # fragments are 64 KiB so this is unreachable, kept for safety
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    out += data[start:end]


def _emit_copy(out: bytearray, offset: int, ln: int) -> None:
    # split long matches into <=64-byte copy elements; keep every
    # piece >= 4 so the 1-byte form stays valid for the remainder
    while ln > 0:
        piece = min(ln, 64)
        if ln - piece in (1, 2, 3):
            piece -= 4 - (ln - piece)
        if 4 <= piece <= 11 and offset < 2048:
            out.append(1 | ((piece - 4) << 2) | ((offset >> 8) << 5))
            out.append(offset & 0xFF)
        elif offset < 1 << 16:
            out.append(2 | ((piece - 1) << 2))
            out += offset.to_bytes(2, "little")
        else:
            out.append(3 | ((piece - 1) << 2))
            out += offset.to_bytes(4, "little")
        ln -= piece


def _compress_fragment(out: bytearray, frag: bytes) -> None:
    n = len(frag)
    if n < 4:
        _emit_literal(out, frag, 0, n)
        return
    table: dict[int, int] = {}
    pos = 0
    lit_start = 0
    limit = n - 3
    while pos < limit:
        key = int.from_bytes(frag[pos : pos + 4], "little")
        cand = table.get(key)
        table[key] = pos
        if cand is None or frag[cand : cand + 4] != frag[pos : pos + 4]:
            pos += 1
            continue
        # extend the match forward
        mlen = 4
        while pos + mlen < n and frag[cand + mlen] == frag[pos + mlen]:
            mlen += 1
        _emit_literal(out, frag, lit_start, pos)
        _emit_copy(out, pos - cand, mlen)
        pos += mlen
        lit_start = pos
    _emit_literal(out, frag, lit_start, n)


def compress(data: bytes) -> bytes:
    """Encode one raw-snappy buffer. Fragments are compressed
    independently (offsets never cross a 64 KiB boundary), exactly
    like the reference encoder, so any spec decoder accepts it."""
    out = bytearray()
    ln = len(data)
    while True:  # varint preamble
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            break
    for start in range(0, len(data), _FRAGMENT):
        _compress_fragment(out, data[start : start + _FRAGMENT])
    return bytes(out)  # empty input -> lone 0x00 preamble


# ---------------------------------------------------------------------------
# Hadoop SnappyCodec block stream (BlockCompressorStream layout)
# ---------------------------------------------------------------------------


def block_compress(data: bytes, block_size: int = BLOCK_SIZE) -> bytes:
    """Hadoop BlockCompressorStream framing — layout and corrupt-input
    guards live once in sources/hadoop_framing.py (shared with
    Lz4Codec); empty input -> empty stream."""
    from .hadoop_framing import block_compress as _bc

    return _bc(data, compress, block_size)


def block_uncompress(data: bytes) -> bytes:
    """Decode a Hadoop block-framed stream; corrupt input raises
    ValueError uniformly (see sources/hadoop_framing.py)."""
    from .hadoop_framing import block_uncompress as _bu

    return _bu(data, uncompress, "snappy")
