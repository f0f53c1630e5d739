"""Hadoop BlockCompressorStream framing, shared by the pure-Python
snappy and lz4 codecs (``o.a.h.io.compress.BlockCompressorStream``:
repeated ``[i32 BE uncompressed-block-length]`` then one or more
``[i32 BE compressed-chunk-length][raw chunk]`` sub-blocks per
block). The per-codec modules (``snappy_py``, ``lz4_py``) delegate
their ``block_compress``/``block_uncompress`` here so the framing
layout and its corrupt-input guards exist exactly once."""

from __future__ import annotations

import struct
from collections.abc import Callable


def block_compress(
    data: bytes,
    compress: Callable[[bytes], bytes],
    block_size: int,
) -> bytes:
    """Frame ``data`` in block_size blocks of one chunk each; empty
    input -> empty stream, matching BlockCompressorStream's finish()
    writing nothing when no bytes were consumed."""
    out = bytearray()
    for start in range(0, len(data), block_size):
        block = data[start : start + block_size]
        comp = compress(block)
        out += struct.pack(">i", len(block))
        out += struct.pack(">i", len(comp))
        out += comp
    return bytes(out)


def block_uncompress(
    data: bytes,
    uncompress: Callable[[bytes], bytes],
    name: str,
) -> bytes:
    """Decode a framed stream. Corrupt input — truncated headers,
    zero/negative lengths, or an empty chunk that could never make
    progress — raises ValueError uniformly (``name`` prefixes the
    message, e.g. "snappy"/"lz4")."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError(f"{name} block stream: truncated block header")
        (orig,) = struct.unpack_from(">i", data, pos)
        pos += 4
        if orig < 0:
            raise ValueError(
                f"{name} block stream: negative block length {orig}"
            )
        produced = 0
        while produced < orig:
            if pos + 4 > n:
                raise ValueError(
                    f"{name} block stream: truncated chunk header"
                )
            (clen,) = struct.unpack_from(">i", data, pos)
            pos += 4
            # clen <= 0 would make an empty chunk and loop forever
            if clen <= 0 or pos + clen > n:
                raise ValueError(
                    f"{name} block stream: bad chunk length {clen} "
                    f"at offset {pos - 4}"
                )
            chunk = uncompress(data[pos : pos + clen])
            pos += clen
            if not chunk:  # an empty chunk can never make progress
                raise ValueError(
                    f"{name} block stream: empty chunk inside a "
                    "non-empty block"
                )
            out += chunk
            produced += len(chunk)
        if produced != orig:
            raise ValueError(
                f"{name} block stream: produced {produced}, header "
                f"said {orig}"
            )
    return bytes(out)
