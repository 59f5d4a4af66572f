"""Pure-Python XXH64, bit-identical to Spark's ``F.xxhash64`` (seed 42).

Why this exists: a point lookup (``CowTable.read_conversation``) must prune
to one bucket BEFORE any Spark job runs. Computing ``pmod(xxhash64(conv_id),
n_buckets)`` with a ``spark.range(1)`` job pays full job-launch latency for
one string (the round-1 anti-pattern); the hash is a published, stable
algorithm (xxHash, BSD — the same spec Spark's
``catalyst.expressions.XxHash64`` implements), so the driver computes it in
microseconds. ``tests/test_metadata_and_robustness.py::
test_xxhash64_matches_spark_expression`` pins equality against the
Spark expression over a corpus of edge-case strings.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, k: int) -> int:
    acc = (acc + k * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``. Spark's default seed is 42."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Two's-complement view — what Spark's LongType column holds."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(conv_id: str, n_buckets: int) -> int:
    """Driver-side twin of ``table.bucket_expr``: pmod(xxhash64(s), n).

    Python's ``%`` on a negative dividend already yields the non-negative
    remainder, which is exactly Spark's ``pmod`` semantics.
    """
    return xxh64_signed(conv_id.encode("utf-8")) % n_buckets
