"""Kafka murmur2 partition parity (PartitionGenerator.java:15-25).

The Java-compatibility vectors are the public ones used by non-JVM
Kafka clients to prove byte-for-byte agreement with
``Utils.murmur2`` + ``Utils.toPositive`` + mod-N routing.
"""

import pytest

from kafkastreamsinteractivequeries_spark.functions.partitioning import (
    murmur2,
    partition_for_key,
    to_positive,
)

# key -> toPositive(murmur2(key)) % 1000
JAVA_COMPAT_VECTORS = {
    b"": 681,
    b"a": 524,
    b"ab": 434,
    b"abc": 107,
    b"123456789": 566,
    b"\x00 ": 742,
}


@pytest.mark.parametrize("key,want", sorted(JAVA_COMPAT_VECTORS.items()))
def test_murmur2_java_compatibility(key, want):
    assert to_positive(murmur2(key)) % 1000 == want


def test_murmur2_returns_signed_32bit():
    for key in (b"", b"a", b"purchase", b"\xff" * 17):
        h = murmur2(key)
        assert -(1 << 31) <= h < (1 << 31)


def test_to_positive_clears_sign_bit_not_abs():
    # Java Math.abs(Integer.MIN_VALUE) is negative; & 0x7fffffff is total
    assert to_positive(-(1 << 31)) == 0
    assert to_positive(-1) == 0x7FFFFFFF
    assert to_positive(5) == 5


def test_partition_for_key_reference_shape():
    # PartitionGenerator prints murmur2 mod 2: always 0 or 1, stable
    for key in ("purchase", "click", "signup", "view", "error"):
        p = partition_for_key(key, 2)
        assert p in (0, 1)
        assert p == partition_for_key(key, 2)


def test_partition_for_key_rejects_nonpositive():
    with pytest.raises(ValueError):
        partition_for_key("x", 0)
