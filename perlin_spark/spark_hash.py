"""Driver-side replica of Spark's ``hash()`` (Murmur3 x86_32, seed 42).

Query-time bucket pruning needs ``pmod(hash(field, term), buckets)`` for a
handful of query terms.  r1 computed it with a one-row Spark job +
``collect()`` per query — a whole extra job on the latency path.  This is
the same function in ~30 lines of integer arithmetic (parity-tested
against ``F.hash`` in ``tests/test_engine_features.py``).

Reference semantics (public Spark source,
``org.apache.spark.unsafe.hash.Murmur3_x86_32``):

* strings hash their UTF-8 bytes via ``hashUnsafeBytes``: 4-byte
  little-endian blocks through the standard Murmur3 mix, then each
  remaining byte **sign-extended** and mixed as its own block (Spark
  quirk — not tail accumulation like canonical Murmur3);
* multi-column ``hash(a, b)`` chains: ``seed -> hash(a) -> hash(b)``.
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


def _to_signed32(x: int) -> int:
    x &= _M32
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_utf8(s: str, seed: int) -> int:
    """Spark ``Murmur3_x86_32.hashUnsafeBytes`` over the UTF-8 bytes."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed & _M32
    aligned = n - n % 4
    for i in range(0, aligned, 4):
        block = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(block))
    for i in range(aligned, n):
        byte = data[i]
        if byte >= 128:  # Java bytes are signed; sign-extend into the int
            byte -= 256
        h1 = _mix_h1(h1, _mix_k1(byte & _M32))
    return _to_signed32(_fmix(h1, n))


def spark_hash_strings(values: list[str], seed: int = 42) -> int:
    """``F.hash(c1, c2, ...)`` for string columns, computed on the driver."""
    h = seed
    for v in values:
        h = hash_utf8(v, h)
    return h


def bucket_of(field: str, term: str, buckets: int) -> int:
    """``pmod(hash(field, term), buckets)`` — the epoch bucket function."""
    h = spark_hash_strings([field, term])
    return ((h % buckets) + buckets) % buckets
