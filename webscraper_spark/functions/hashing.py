"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` (seed 42).

The engine keys everything on ``xxhash64(canonical_url)`` computed JVM-side
with ``F.xxhash64`` (zero-copy, codegen'd). The single-process reference
simulator (tests/reference_sim.py) and the Python-side filter structures
need the *same* hash so that seen-set membership compares bit-for-bit.
XXH64 is a public algorithm (github.com/Cyan4973/xxHash spec); this is an
independent implementation, unit-tested against Spark's output.

Spark semantics for a string column: XXH64(utf8_bytes, seed=42), result as
signed int64.
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of ``data`` → unsigned 64-bit int."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, k1)
            v2 = _round(v2, k2)
            v3 = _round(v3, k3)
            v4 = _round(v4, k4)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Signed-int64 XXH64 of a string's UTF-8 bytes — equals Spark's
    ``F.xxhash64(lit(s))``."""
    return _to_signed(xxh64(s.encode("utf-8"), seed))


def xxh64_long(v: int, seed: int = SPARK_SEED) -> int:
    """Signed-int64 XXH64 of a long — equals Spark's ``F.xxhash64`` on a
    LongType column (hashes the 8-byte little-endian value)."""
    return _to_signed(xxh64(struct.pack("<q", v), seed))
