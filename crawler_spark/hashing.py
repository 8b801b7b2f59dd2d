"""Pure-Python XXH64 matching Spark's ``xxhash64`` SQL function.

Spark's ``xxhash64(col)`` hashes the UTF-8 bytes of a string with the
public XXH64 algorithm (Yann Collet, BSD) at seed 42 and returns a
*signed* 64-bit integer.  We re-implement XXH64 here from the public
specification so the single-process golden crawl model and the fixture
generator can compute the exact same ``url_hash`` values that the Spark
engine computes JVM-side with ``F.xxhash64`` — Python is never used for
hashing in the distributed hot path.

Equivalence with Spark is pinned by ``tests/test_hashing.py``.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = 0xFFFFFFFFFFFFFFFF

SPARK_XXHASH64_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _MASK


def xxhash64_bytes(data: bytes, seed: int = SPARK_XXHASH64_SEED) -> int:
    """XXH64 of *data*, returned as an UNSIGNED 64-bit int."""
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
        i = 0

    h = (h + n) & _MASK

    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h ^= k1
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8

    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
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


def _to_signed64(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_str(s: str, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed-64 XXH64 of a string's UTF-8 bytes — equals Spark's
    ``xxhash64(lit(s))`` (pinned in tests/test_hashing.py)."""
    return _to_signed64(xxhash64_bytes(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_XXHASH64_SEED) -> int:
    """Signed-64 XXH64 of a LongType value — Spark hashes longs with the
    dedicated 8-byte-int path (hashInt/hashLong), not the byte path."""
    # Spark's XXH64.hashLong: process the long as one 8-byte lane.
    h = (seed + _P5 + 8) & _MASK
    k1 = _round(0, v & _MASK)
    h ^= k1
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return _to_signed64(h)
