"""Kafka-compatible key partitioning (reference parity for
``controller/PartitionGenerator.java:15-25``).

The reference answers "which partition owns this key?" with Kafka's
producer default: ``toPositive(murmur2(utf8(key))) % numPartitions``.
Spark's ``pmod(hash(key), N)`` is a different hash family, so the two
disagree on concrete keys.  This module implements the exact Kafka
algorithm (Apache Kafka ``common/utils/Utils.java`` ``murmur2`` /
``toPositive`` — public Apache-2.0 code, re-derived here in pure
Python) so the ``/partition/<key>`` endpoint can answer with numeric
parity to the reference.

Driver-side only: partition lookup is a per-request scalar, never a
per-row hot path (Spark-side row routing stays with the JVM ``hash``).
"""

from __future__ import annotations

_M = 0x5BD1E995
_SEED = 0x9747B28C
_MASK = 0xFFFFFFFF


def murmur2(data: bytes) -> int:
    """32-bit murmur2 exactly as Apache Kafka computes it
    (``Utils.murmur2``): seed ``0x9747b28c ^ len``, little-endian
    4-byte blocks, tail switch, 13/15-bit avalanche.

    Returns a SIGNED 32-bit int (Java semantics), so callers can apply
    ``to_positive`` just like ``Utils.toPositive``.
    """
    length = len(data)
    h = (_SEED ^ length) & _MASK

    n4 = length & ~3
    for i in range(0, n4, 4):
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) | (data[i + 3] << 24)
        k = (k * _M) & _MASK
        k ^= k >> 24
        k = (k * _M) & _MASK
        h = (h * _M) & _MASK
        h ^= k

    tail = length & 3
    if tail == 3:
        h ^= data[n4 + 2] << 16
    if tail >= 2:
        h ^= data[n4 + 1] << 8
    if tail >= 1:
        h ^= data[n4]
        h = (h * _M) & _MASK

    h ^= h >> 13
    h = (h * _M) & _MASK
    h ^= h >> 15

    # Java int is signed
    return h - (1 << 32) if h >= (1 << 31) else h


def to_positive(number: int) -> int:
    """``Utils.toPositive``: clear the sign bit (NOT abs — Java's
    ``Math.abs(Integer.MIN_VALUE)`` is negative, ``& 0x7fffffff`` is
    total)."""
    return number & 0x7FFFFFFF


def partition_for_key(key: str, num_partitions: int) -> int:
    """Kafka DefaultPartitioner for a non-null string key: the exact
    number ``PartitionGenerator.java:22`` prints (with N=2 there).
    """
    if num_partitions <= 0:
        raise ValueError(f"num_partitions must be positive, got {num_partitions}")
    return to_positive(murmur2(key.encode("utf-8"))) % num_partitions
