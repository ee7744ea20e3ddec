"""Unit tests for operators/sketches.py (KMV distinct sketch)."""

from pyspark.sql import functions as F

from kafkastreamsinteractivequeries_spark.operators.sketches import (
    kmv_distinct,
    kmv_hash,
)


def test_kmv_exact_below_k(spark):
    # Fewer distinct keys than k → the sketch holds every hash → exact.
    df = spark.range(10).select(
        F.lit("g").alias("g"), (F.col("id") % 5).alias("key")
    )
    row = kmv_distinct(df, "key", ["g"], k=32).collect()[0]
    assert row.n_kept == 5
    assert row.distinct_estimate == 5.0


def test_kmv_estimate_accuracy(spark):
    # 2000 distinct keys, k=64: KMV relative standard error ~ 1/sqrt(k-1)
    # ≈ 12.6%; assert within 4 sigma.
    df = spark.range(2000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    row = kmv_distinct(df, "key", ["g"], k=64).collect()[0]
    assert row.n_kept == 64
    assert abs(row.distinct_estimate - 2000) / 2000 < 0.5


def test_kmv_hash_bijective_on_small_domain(spark):
    # Odd multipliers mod 2^32 are bijections → no collisions below the
    # ring size, so the sketch is collision-free where it matters.
    n = spark.range(100_000).select(kmv_hash(F.col("id")).alias("h")).agg(
        F.countDistinct("h")
    ).collect()[0][0]
    assert n == 100_000


def test_kmv_insensitive_to_duplication(spark):
    # Duplicated input rows must not move the estimate (DISTINCT-ness).
    base = spark.range(500).select(F.lit("g").alias("g"), F.col("id").alias("key"))
    dup = base.union(base).union(base)
    a = kmv_distinct(base, "key", ["g"], k=32).collect()[0]
    b = kmv_distinct(dup, "key", ["g"], k=32).collect()[0]
    assert a.distinct_estimate == b.distinct_estimate
    assert a.kth_hash == b.kth_hash
