"""Pure-Python replica of Spark's ``F.hash`` for 64-bit integers.

Spark's ``hash`` expression is Murmur3_x86_32 (public Austin Appleby
algorithm) with seed 42; a LongType input is mixed as two 32-bit words,
low word first (Spark's ``Murmur3_x86_32.hashLong``). Replicating it
driver-side lets oracle generators reproduce hash-ordered deterministic
samples (e.g. the IVF k-means fit) without a SparkSession.
Validated bit-exact against ``F.hash`` in tests/test_search_multimodal.py.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def spark_hash_long(value: int, seed: int = 42) -> int:
    """Spark ``F.hash(col)`` for a LongType column value (signed int32)."""
    v = value & 0xFFFFFFFFFFFFFFFF
    h1 = _mix_h1(seed, _mix_k1(v & _M32))
    h1 = _mix_h1(h1, _mix_k1((v >> 32) & _M32))
    r = _fmix(h1, 8)
    return r - (1 << 32) if r >= (1 << 31) else r
