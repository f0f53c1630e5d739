"""Pure-Python LZ4 block codec + Hadoop Lz4Codec framing.

Completes the Hadoop-BUNDLED compression matrix for the from-scratch
Python RCFile reader (``ql/io/RCFile.java`` stores the codec class in
the header; ``o.a.h.io.compress.Lz4Codec`` shipped in Hadoop 2.x, the
HDP era) alongside DefaultCodec/gzip/bzip2/snappy. Implemented from
the PUBLIC LZ4 block format specification
(``lz4/doc/lz4_Block_format.md``):

- a block is a sequence of **sequences**: a token byte whose high
  nibble is the literal-run length (15 = extended: +255 per 0xFF
  byte, then the final byte) and whose low nibble is match length - 4
  (15 = extended the same way); the literals; then a 2-byte LE match
  offset (1..65535, may overlap the output being produced). The last
  sequence is literals-only (no offset). Encoder-side rules: the
  final 5 bytes are always literals and the last match must start at
  least 12 bytes before the end of the block.
- Hadoop wraps the raw codec in the same BlockCompressorStream
  framing as snappy: repeated ``[i32 BE uncompressed-block-length]``
  then ``[i32 BE compressed-chunk-length][raw chunk]`` sub-blocks
  (256 KiB default buffers).

Correctness is pinned against an INDEPENDENT implementation: pyarrow
ships the reference lz4 library (``pa.Codec("lz4_raw")``), and the
tests round-trip both directions against it plus hand-decoded wire
vectors.
"""

from __future__ import annotations

import struct

BLOCK_SIZE = 256 * 1024  # io.compression.codec.lz4.buffersize default
_MIN_MATCH = 4
_LAST_LITERALS = 5  # spec: final 5 bytes are always literals
_MFLIMIT = 12  # spec: last match starts >= 12 bytes before block end


def uncompress(data: bytes, expected: int | None = None) -> bytes:
    """Decode one raw LZ4 block. Truncated or corrupt input raises
    ValueError (module convention — never a bare IndexError or a
    silently-shortened literal run)."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        # literal run
        lit = token >> 4
        if lit == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated stream (literal length)")
                b = data[pos]
                pos += 1
                lit += b
                if b != 255:
                    break
        if pos + lit > n:
            raise ValueError("lz4: truncated stream (literal run)")
        out += data[pos : pos + lit]
        pos += lit
        if pos >= n:  # last sequence is literals-only
            break
        # match
        if pos + 2 > n:
            raise ValueError("lz4: truncated stream (match offset)")
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(
                f"lz4: bad match offset {offset} at output {len(out)}"
            )
        mlen = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated stream (match length)")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if offset >= mlen:
            start = len(out) - offset
            out += out[start : start + mlen]
        else:  # overlapping copy replays produced bytes
            start = len(out) - offset
            for i in range(mlen):
                out.append(out[start + i])
    if expected is not None and len(out) != expected:
        raise ValueError(
            f"lz4: produced {len(out)} bytes, expected {expected}"
        )
    return bytes(out)


def _emit_sequence(
    out: bytearray, data: bytes, lit_start: int, lit_end: int,
    offset: int | None, mlen: int,
) -> None:
    lit = lit_end - lit_start
    ml = mlen - _MIN_MATCH if offset is not None else 0
    out.append(min(lit, 15) << 4 | min(ml, 15))
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data[lit_start:lit_end]
    if offset is None:
        return
    out += offset.to_bytes(2, "little")
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def compress(data: bytes) -> bytes:
    """Encode one raw LZ4 block (greedy 4-byte-hash matcher honoring
    the spec's end-of-block rules). Any spec decoder accepts it."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # lone token: zero literals, no match
        return bytes(out)
    table: dict[int, int] = {}
    pos = 0
    lit_start = 0
    match_limit = n - _MFLIMIT  # matches must start before this
    while pos < match_limit:
        key = int.from_bytes(data[pos : pos + 4], "little")
        cand = table.get(key)
        table[key] = pos
        if (
            cand is None
            or pos - cand > 65535
            or data[cand : cand + 4] != data[pos : pos + 4]
        ):
            pos += 1
            continue
        mlen = _MIN_MATCH
        hard_end = n - _LAST_LITERALS  # matches never cover final 5 bytes
        while pos + mlen < hard_end and data[cand + mlen] == data[pos + mlen]:
            mlen += 1
        _emit_sequence(out, data, lit_start, pos, pos - cand, mlen)
        pos += mlen
        lit_start = pos
    _emit_sequence(out, data, lit_start, n, None, 0)
    return bytes(out)


def block_compress(data: bytes, block_size: int = BLOCK_SIZE) -> bytes:
    """Hadoop BlockCompressorStream framing — layout and corrupt-input
    guards live once in sources/hadoop_framing.py (shared with
    SnappyCodec); empty input -> empty stream."""
    from .hadoop_framing import block_compress as _bc

    return _bc(data, compress, block_size)


def block_uncompress(data: bytes) -> bytes:
    """Decode a Hadoop block-framed stream; corrupt input raises
    ValueError uniformly (see sources/hadoop_framing.py)."""
    from .hadoop_framing import block_uncompress as _bu

    return _bu(data, uncompress, "lz4")
