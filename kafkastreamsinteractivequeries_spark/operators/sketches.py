"""Mergeable sketch operators for approximate statistics at 100 TB
(north-star extension, beyond the reference's surface — SURVEY.md §2.4
notes the reference has no aggregate surface at all beyond T5).

The engine-native choice would be Spark's HyperLogLog
(``approx_count_distinct``), but its binary sketch is engine-specific —
the DuckDB oracle could never hash-match it.  KMV (k-minimum-values) is
the portable alternative: with a deterministic arithmetic hash, the
sketch CONTENT (the k smallest hash values) is bit-identical across
engines, so the estimate is exactly reproducible and oracle-checkable
while keeping every property that matters at scale:

- one pass, map-side partial aggregation (duplicates collapse early);
- sketches are mergeable (union of two KMV sets, re-truncated to k) —
  the same merge the shuffle's partial aggregation performs;
- memory is O(k) per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kafkastreamsinteractivequeries_spark.operators.analytics import top_k_per_key_two_phase

# Multiplicative hash over a 32-bit ring: deterministic, uniform enough
# for sketching, and pure integer arithmetic — bit-identical in any
# engine (no engine-specific hash function in the contract).  Two
# smaller-multiplier rounds instead of one Knuth multiply keep every
# intermediate product < 2^63 for ANY input key (2^32 · 48271 ≈ 2e14),
# so the arithmetic never overflows int64 in either engine.  Each round
# is an odd multiplier mod 2^32 — a bijection on the ring, so distinct
# keys below 2^32 never collide.
_RING = 2**32
_MUL1 = 48271
_MUL2 = 16807


def kmv_hash(col: F.Column) -> F.Column:
    """Map an integer key onto the 32-bit hash ring."""
    h1 = (F.pmod(col, F.lit(_RING)) * _MUL1) % _RING
    return (h1 * _MUL2) % _RING


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 32,
) -> DataFrame:
    """Approximate COUNT(DISTINCT key) per group via a KMV sketch.

    Estimator: with hashes uniform on [0, 1), the k-th smallest value
    h_(k) estimates distinct count as (k-1) / h_(k); if a group holds
    fewer than k distinct keys the sketch is exact by construction.

    The k smallest hashes are selected with the salted two-phase top-k
    (``top_k_per_key_two_phase``) — per-(group, salt) partial ranking
    bounds every sort, so one group with billions of distinct keys
    cannot pin a single task (the plain window-rank skew cliff).
    """
    hashes = (
        df.select(*[F.col(c) for c in group_cols], kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .withColumn("neg_h", -F.col("h"))
    )
    kept = top_k_per_key_two_phase(
        hashes, group_cols, order_col="neg_h", tiebreak_col="h", k=k
    )
    per_group = kept.groupBy(*group_cols).agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    saturated = F.col("n_kept") >= k
    estimate = F.when(
        saturated,
        F.round((F.lit(k) - 1.0) / (F.col("kth_hash") / F.lit(float(_RING))), 4),
    ).otherwise(F.col("n_kept").cast("double"))
    return per_group.select(
        *group_cols,
        F.col("n_kept"),
        F.col("kth_hash"),
        estimate.alias("distinct_estimate"),
    )


def kmv_distinct_users(events: DataFrame, k: int = 32) -> DataFrame:
    """x10: approximate distinct users per event type over the events
    stream — the per-key cardinality profile a pipeline consults before
    choosing join strategies (broadcast vs shuffle) or partition
    layouts."""
    return kmv_distinct(events, key_col="user_id", group_cols=["event_type"], k=k)
