"""Pure-Python reference implementations of the hash functions the
engine exposes (`hash`, `xxhash64`) — independent twins used to build
value oracles and property tests, since DuckDB ships neither.

Both algorithms are public: MurmurHash3 (Austin Appleby, public
domain) and xxHash64 (Yann Collet, BSD). The variants here match the
JVM engine's conventions (reference: Hive surfaces Java hashCode via
``ObjectInspectorUtils.hashCode``; the Spark engine uses Murmur3/XXH64
— both are pinned by tests against the JVM output):

- ``murmur3_32``: Murmur3 x86_32 where the non-4-aligned TAIL bytes
  are each mixed as a full round on the SIGNED byte value (the JVM
  unsafe-bytes convention), not the canonical 3-byte tail mix.
- ``xxhash64``: canonical XXH64 (8-byte stripes, 4-byte, then 1-byte
  tail), seed 42, returned as a signed 64-bit int.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def _signed64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def murmur3_32(data: bytes, seed: int = 42) -> int:
    """Murmur3 x86_32 over bytes, JVM tail convention, signed int32.
    Matches the engine's ``hash()`` of a string (UTF-8 bytes, seed 42).
    """
    h1 = seed & _M32
    n_aligned = len(data) - len(data) % 4
    for i in range(0, n_aligned, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(n_aligned, len(data)):
        b = data[i]
        if b >= 0x80:  # JVM byte is signed
            b -= 0x100
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    h1 ^= len(data)
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return _signed32(h1)


_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def xxhash64(data: bytes, seed: int = 42) -> int:
    """Canonical XXH64, signed int64. Matches the engine's
    ``xxhash64()`` of a string (UTF-8 bytes, seed 42)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            for vi, off in ((0, 0), (1, 8), (2, 16), (3, 24)):
                lane = int.from_bytes(data[i + off : i + off + 8], "little")
                v = (v1, v2, v3, v4)[vi]
                v = (v + lane * _P2) & _M64
                v = (_rotl64(v, 31) * _P1) & _M64
                if vi == 0:
                    v1 = v
                elif vi == 1:
                    v2 = v
                elif vi == 2:
                    v3 = v
                else:
                    v4 = v
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            v = (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = (((h ^ v) * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        lane = int.from_bytes(data[i : i + 8], "little")
        lane = (_rotl64((lane * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl64(h ^ lane, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((_rotl64(h ^ ((lane * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return _signed64(h)
